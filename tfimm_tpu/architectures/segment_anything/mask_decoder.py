"""SAM mask decoder (reference: segment_anything/mask_decoder.py:8-241).

Mask/IoU tokens + TwoWayTransformer, transposed-conv upscaling, hypernetwork
MLPs producing per-mask dynamic filters, IoU quality head.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tfimm_tpu.ops import Dense, act_layer_factory, norm_layer_factory
from tfimm_tpu.ops.basic import pt_default_init

__all__ = ["MaskDecoder", "OutputUpscaling", "DecoderMLP", "ConvTranspose2d"]


class ConvTranspose2d:
    """Transposed conv. Params: {"kernel": (kh, kw, in, out), "bias"}."""

    def __init__(self, in_channels, out_channels, kernel_size, stride,
                 use_bias=True):
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = (kernel_size, kernel_size)
        self.stride = (stride, stride)
        self.use_bias = use_bias

    def init(self, rng):
        k_rng, b_rng = jax.random.split(rng)
        shape = (*self.kernel_size, self.in_channels, self.out_channels)
        p = {"kernel": pt_default_init()(k_rng, shape)}
        if self.use_bias:
            fan_in = self.kernel_size[0] * self.kernel_size[1] * self.in_channels
            bound = 1.0 / jnp.sqrt(fan_in)
            p["bias"] = jax.random.uniform(b_rng, (self.out_channels,),
                                           minval=-bound, maxval=bound)
        return p

    def __call__(self, p, x):
        # PT ConvTranspose2d semantics == lax.conv_transpose with the kernel
        # spatially FLIPPED (verified vs torch; a non-flipped kernel mirrors
        # the taps inside each stride block). Params stay in PT tap order.
        kernel = p["kernel"][::-1, ::-1].astype(x.dtype)
        y = jax.lax.conv_transpose(
            x, kernel, strides=self.stride,
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + p["bias"].astype(y.dtype)
        return y


class OutputUpscaling:
    """4x upscaling via two stride-2 transposed convs (Meta naming 0..4)."""

    def __init__(self, embed_dim, act_layer):
        self.act = act_layer_factory(act_layer)
        norm = norm_layer_factory("layer_norm_eps_1e-6")
        self.conv1 = ConvTranspose2d(embed_dim, embed_dim // 4, 2, 2)
        self.norm1 = norm(embed_dim // 4)
        self.conv2 = ConvTranspose2d(embed_dim // 4, embed_dim // 8, 2, 2)

    def init(self, rng):
        r = jax.random.split(rng, 3)
        return {"0": self.conv1.init(r[0]), "1": self.norm1.init(r[1]),
                "3": self.conv2.init(r[2])}

    def __call__(self, p, x):
        x = self.act(self.norm1(p["1"], self.conv1(p["0"], x)))
        return self.act(self.conv2(p["3"], x))


class DecoderMLP:
    """Simple relu MLP with Meta naming (layers.j)."""

    def __init__(self, in_dim, hidden_dim, output_dim, nb_layers,
                 sigmoid_output=False):
        dims = [in_dim] + [hidden_dim] * (nb_layers - 1)
        outs = [hidden_dim] * (nb_layers - 1) + [output_dim]
        self.layers = [Dense(d, o) for d, o in zip(dims, outs)]
        self.sigmoid_output = sigmoid_output

    def init(self, rng):
        return {"layers": {str(j): layer.init(jax.random.fold_in(rng, j))
                           for j, layer in enumerate(self.layers)}}

    def __call__(self, p, x):
        for j, layer in enumerate(self.layers):
            x = layer(p["layers"][str(j)], x)
            if j < len(self.layers) - 1:
                x = jax.nn.relu(x)
        if self.sigmoid_output:
            x = jax.nn.sigmoid(x)
        return x


class MaskDecoder:
    def __init__(self, transformer, embed_dim, nb_multimask_outputs, act_layer,
                 iou_head_depth, iou_head_hidden_dim):
        self.transformer = transformer
        self.embed_dim = embed_dim
        self.nb_mask_tokens = nb_multimask_outputs + 1
        self.output_upscaling = OutputUpscaling(embed_dim, act_layer)
        self.output_hypernetworks_mlps = [
            DecoderMLP(embed_dim, embed_dim, embed_dim // 8, 3)
            for _ in range(self.nb_mask_tokens)
        ]
        self.iou_prediction_head = DecoderMLP(embed_dim, iou_head_hidden_dim,
                                              self.nb_mask_tokens,
                                              iou_head_depth)

    def init(self, rng):
        r = jax.random.split(rng, 5)
        return {
            "iou_token": {"weight": jax.random.normal(r[0], (1, self.embed_dim))},
            "mask_tokens": {"weight": jax.random.normal(
                r[1], (self.nb_mask_tokens, self.embed_dim))},
            "transformer": self.transformer.init(r[2]),
            "output_upscaling": self.output_upscaling.init(r[3]),
            "output_hypernetworks_mlps": {
                str(j): mlp.init(jax.random.fold_in(r[4], j))
                for j, mlp in enumerate(self.output_hypernetworks_mlps)
            },
            "iou_prediction_head": self.iou_prediction_head.init(
                jax.random.fold_in(r[4], 99)),
        }

    def predict_masks(self, p, image_embeddings, image_pe, sparse_embeddings,
                      dense_embeddings):
        n = image_embeddings.shape[0]
        output_tokens = jnp.concatenate(
            [p["iou_token"]["weight"], p["mask_tokens"]["weight"]], axis=0
        )
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (n, *output_tokens.shape)
        ).astype(sparse_embeddings.dtype)
        tokens = jnp.concatenate([output_tokens, sparse_embeddings], axis=1)

        tokens, image_embeddings = self.transformer(
            p["transformer"], tokens, image_embeddings + dense_embeddings,
            image_pe,
        )
        iou_token = tokens[:, 0]
        mask_tokens = tokens[:, 1:1 + self.nb_mask_tokens]

        upscaled = self.output_upscaling(p["output_upscaling"],
                                         image_embeddings)
        hyper_in = jnp.stack([
            mlp(p["output_hypernetworks_mlps"][str(j)], mask_tokens[:, j])
            for j, mlp in enumerate(self.output_hypernetworks_mlps)
        ], axis=1)  # (N, K+1, C/8)
        n, h, w, c = upscaled.shape
        masks = jnp.einsum("nkc,nqc->nkq", hyper_in,
                           upscaled.reshape(n, h * w, c))
        masks = masks.reshape(n, -1, h, w)
        iou_pred = self.iou_prediction_head(p["iou_prediction_head"], iou_token)
        return masks, iou_pred

    def __call__(self, p, inputs, multimask_output=False):
        masks, iou_pred = self.predict_masks(
            p, inputs["image_embeddings"], inputs["image_pe"],
            inputs["sparse_embeddings"], inputs["dense_embeddings"],
        )
        if multimask_output:
            return masks[:, 1:], iou_pred[:, 1:]
        return masks[:, 0:1], iou_pred[:, 0:1]
