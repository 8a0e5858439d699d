"""Post-training int8 quantization (tfimm_tpu/quant.py).

Beyond-parity surface — the reference has no quantization story (its closest
knob is the mixed_float16 policy, tfimm/train/problems/classification.py:42-47).
These tests pin the conversion contract: which kernels convert, numerical
closeness to the fp32 model, Dense dispatch, serialization round-trip, and
that every Pallas dispatch site declines quantized params (falls back to the
XLA int8 path instead of reading a ``kernel`` that no longer exists).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tfimm_tpu import create_model, load_model, quantize_int8, save_model
from tfimm_tpu.ops.basic import Dense
from tfimm_tpu.quant import DEFAULT_SKIP, int8_dense_matmul, is_quantized

from tests.models.architectures import TEST_ARCHITECTURES  # noqa: F401 (registers)


def _flat_paths(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat_paths(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def test_dense_matmul_accuracy():
    """Per-channel int8 weights + dynamic per-token activations stay within
    ~1% relative error of the fp32 matmul on well-conditioned inputs."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(256, 384)).astype(np.float32) * 0.02
    x = rng.normal(size=(17, 256)).astype(np.float32)
    scale = np.maximum(np.abs(w).max(axis=0), 1e-8) / 127.0
    wq = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    p = {"kernel_q": jnp.asarray(wq), "kernel_scale": jnp.asarray(scale)}
    y = np.asarray(int8_dense_matmul(p, jnp.asarray(x)))
    ref = x @ w
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 0.01, rel


def test_quantize_selects_and_skips():
    model = create_model("vit_test_model")
    qp = quantize_int8(model.params, min_features=8)
    flat = _flat_paths(qp)
    # Attention/MLP Dense kernels converted...
    assert ("blocks", "0", "attn", "qkv", "kernel_q") in flat
    assert flat[("blocks", "0", "attn", "qkv", "kernel_q")].dtype == jnp.int8
    assert ("blocks", "0", "mlp", "fc1", "kernel_scale") in flat
    # ...classifier head and conv patch-embed stay float.
    assert ("head", "kernel") in flat
    assert not any("kernel_q" in path and "head" in path for path in flat)
    assert flat[("patch_embed", "proj", "kernel")].ndim == 4  # conv untouched
    # Biases untouched everywhere.
    assert flat[("blocks", "0", "attn", "qkv", "bias")].dtype != jnp.int8
    assert is_quantized(qp) and not is_quantized(model.params)


def test_min_features_gate():
    model = create_model("vit_test_model")  # embed_dim 8
    qp = quantize_int8(model.params)  # default min_features=256
    assert not is_quantized(qp)  # everything too small -> no-op
    qp = quantize_int8(model.params, min_features=8)
    assert is_quantized(qp)


def test_skip_list_is_respected():
    model = create_model("vit_test_model")
    qp = quantize_int8(model.params, min_features=8, skip=("blocks",))
    flat = _flat_paths(qp)
    assert not any("kernel_q" in p and "blocks" in p for p in flat)
    assert ("head", "kernel_q") in _flat_paths(
        quantize_int8(model.params, min_features=8, skip=())
    )


def test_dense_dispatches_on_quantized_params():
    layer = Dense(64, 128)
    p = layer.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(5, 64)), jnp.float32)
    ref = np.asarray(layer(p, x))
    pq = quantize_int8({"d": p}, min_features=64)["d"]
    assert "kernel" not in pq and "kernel_q" in pq and "bias" in pq
    out = np.asarray(layer(pq, x))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02


# Families whose forward path has Pallas dispatch sites that read kernels
# directly — each must decline quantized params and produce close outputs.
_GATED = ["vit_test_model", "swin_test_model", "cait_test_model",
          "convnext_test_model", "poolformer_test_model", "pvt_test_model",
          "pvt_v2_test_model", "mixer_test_model", "pit_test_model"]


@pytest.mark.parametrize("model_name", _GATED)
def test_model_forward_close_to_fp32(model_name):
    model = create_model(model_name)
    x = jnp.asarray(
        np.random.default_rng(2).uniform(size=model.dummy_inputs.shape),
        jnp.float32)
    ref = np.asarray(model(x))
    qp = quantize_int8(model.params, min_features=4)
    assert is_quantized(qp)
    out = np.asarray(model(x, params=qp))
    assert out.shape == ref.shape
    assert np.all(np.isfinite(out))
    # Tiny random models have near-zero logits; compare on absolute scale
    # relative to the logit spread.
    spread = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out - ref).max() / spread < 0.15


def test_conv_mlp_1x1_quantization():
    """1x1 ConvMLP kernels (PoolFormer/ConvNeXt conv-MLP) quantize and
    dispatch through Conv2d's int8 matmul path."""
    from tfimm_tpu.ops.mlp import ConvMLP

    mlp = ConvMLP(16, 32)
    p = mlp.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(5).normal(size=(2, 4, 4, 16)),
                    jnp.float32)
    ref = np.asarray(mlp(p, x))
    pq = quantize_int8({"mlp": p}, min_features=16)["mlp"]
    assert pq["fc1"]["kernel_q"].shape == (16, 32)  # stored (in, out)
    assert "kernel" not in pq["fc1"] and "kernel" not in pq["fc2"]
    out = np.asarray(mlp(pq, x))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-3) < 0.05


def test_non_mlp_1x1_convs_stay_float():
    """SE gates / patch embeds / StdConv downsamples are never converted —
    only fc1/fc2 conv positions are."""
    model = create_model("resnet_test_model_deep")  # has SE attn layer
    orig = _flat_paths(model.params)
    qp = _flat_paths(quantize_int8(model.params, min_features=1))
    for path, leaf in orig.items():
        if path[-1] == "kernel" and leaf.ndim == 4 and path[-2] not in (
                "fc1", "fc2"):
            assert path in qp, path  # conv kernel still float at same path


def test_save_load_roundtrip_preserves_int8(tmp_path):
    model = create_model("vit_test_model")
    model.params = quantize_int8(model.params, min_features=8)
    x = jnp.asarray(
        np.random.default_rng(3).uniform(size=model.dummy_inputs.shape),
        jnp.float32)
    ref = np.asarray(model(x))
    save_model(model, str(tmp_path / "m"))
    loaded = load_model(str(tmp_path / "m"))
    flat = _flat_paths(loaded.params)
    assert flat[("blocks", "0", "attn", "qkv", "kernel_q")].dtype == jnp.int8
    assert flat[("blocks", "0", "attn", "qkv", "kernel_scale")].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(loaded(x)), ref, atol=1e-6)


def test_cast_after_quantize_is_harmless():
    model = create_model("vit_test_model")
    model.params = quantize_int8(model.params, min_features=8)
    x = jnp.asarray(
        np.random.default_rng(4).uniform(size=model.dummy_inputs.shape),
        jnp.float32)
    ref = np.asarray(model(x))
    model.cast(jnp.bfloat16)
    flat = _flat_paths(model.params)
    assert flat[("blocks", "0", "attn", "qkv", "kernel_q")].dtype == jnp.int8
    out = np.asarray(model(x.astype(jnp.bfloat16)))
    assert np.all(np.isfinite(out))
    spread = max(np.abs(ref).max(), 1e-3)
    assert np.abs(out.astype(np.float32) - ref).max() / spread < 0.25


def test_ste_gradient_flows_through_quantized_dense():
    """round/clip would give a silent zero activation gradient; the STE
    custom VJP backprops through the dequantized weights instead."""
    layer = Dense(64, 128)
    p = layer.init(jax.random.PRNGKey(1))
    pq = quantize_int8({"d": p}, min_features=64)["d"]
    x = jnp.asarray(np.random.default_rng(6).normal(size=(5, 64)), jnp.float32)

    gq = jax.grad(lambda xx: layer(pq, xx).sum())(x)
    w_deq = np.asarray(pq["kernel_q"], np.float32) * np.asarray(
        pq["kernel_scale"])
    g_ref = np.ones((5, 128), np.float32) @ w_deq.T
    assert np.abs(np.asarray(gq)).max() > 0  # not silently killed
    np.testing.assert_allclose(np.asarray(gq), g_ref, rtol=1e-4, atol=1e-4)

    # Bias gradient still flows (added outside the custom-VJP matmul).
    gb = jax.grad(lambda pp: layer({**pq, "bias": pp}, x).sum())(p["bias"])
    np.testing.assert_allclose(np.asarray(gb), 5.0 * np.ones(128), rtol=1e-5)


def test_finetune_head_on_quantized_backbone():
    """One optimizer step on the float head of an int8-quantized model
    moves the loss — the QAT-style use case."""
    import optax

    model = create_model("vit_test_model", nb_classes=4)
    qp = quantize_int8(model.params, min_features=8)
    x = jnp.asarray(
        np.random.default_rng(7).uniform(size=(2,) + model.dummy_inputs.shape[1:]),
        jnp.float32)
    y = jnp.asarray([0, 3])

    def loss_fn(head):
        logits = model.apply({**qp, "head": head}, x, training=False)
        return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()

    g = jax.grad(loss_fn)(qp["head"])
    assert float(jnp.abs(g["kernel"]).max()) > 0
    head2 = jax.tree.map(lambda a, b: a - 0.5 * b, qp["head"], g)
    assert float(loss_fn(head2)) < float(loss_fn(qp["head"]))


def test_lora_layers_are_not_quantized():
    """LoRA param dicts read ``kernel`` directly; quantization must skip
    them (quantize after merging instead)."""
    from tfimm_tpu.architectures import lora

    base = create_model(
        "convnext_tiny", input_size=(32, 32), patch_size=4,
        embed_dim=(4, 4, 4, 4), nb_blocks=(1, 1, 1, 1), nb_classes=5)
    model = lora.convert_to_lora_model(base, lora_rank=2)
    qp = quantize_int8(model.params, min_features=1, skip=())
    flat = _flat_paths(qp)
    lora_parents = {p[:-1] for p in flat if p[-1] == "kernel_lora_a"}
    assert lora_parents  # the conversion did produce LoRA layers
    for parent in lora_parents:
        assert parent + ("kernel",) in flat, parent
    # The model still runs with the partially quantized tree.
    x = jnp.asarray(
        np.random.default_rng(8).uniform(size=(1, 32, 32, 3)), jnp.float32)
    assert np.all(np.isfinite(np.asarray(model(x, params=qp))))


def test_transfer_weights_rejects_quantized_source():
    from tfimm_tpu import transfer_weights

    src = create_model("vit_test_model")
    src.params = quantize_int8(src.params, min_features=8)
    dst = create_model("vit_test_model", nb_classes=7)
    with pytest.raises(ValueError, match="quantized"):
        transfer_weights(src, dst)


def test_default_skip_names():
    # The skip list must keep covering the registry's classifier names.
    for name in ("head", "pre_logits", "head_dist", "classifier"):
        assert any(s in name for s in DEFAULT_SKIP), name


def test_se_gate_orientation_never_quantized():
    """SEModule names its 1x1 convs fc1/fc2 (ops/se.py:26-27) but is a
    reduce->expand bottleneck driving a sigmoid gate; even when a huge SE
    bottleneck clears min_features it must stay float. ConvMLP (expand->
    contract) at the same names does convert."""
    rng = jax.random.PRNGKey(0)
    se = {"fc1": {"kernel": jax.random.normal(rng, (1, 1, 512, 64))},
          "fc2": {"kernel": jax.random.normal(rng, (1, 1, 64, 512))}}
    mlp = {"fc1": {"kernel": jax.random.normal(rng, (1, 1, 64, 512))},
           "fc2": {"kernel": jax.random.normal(rng, (1, 1, 512, 64))}}
    qp = quantize_int8({"se": se, "mlp": mlp}, min_features=64)
    assert "kernel" in qp["se"]["fc1"] and "kernel_q" not in qp["se"]["fc1"]
    assert "kernel" in qp["se"]["fc2"] and "kernel_q" not in qp["se"]["fc2"]
    assert "kernel_q" in qp["mlp"]["fc1"]
    assert "kernel_q" in qp["mlp"]["fc2"]


def test_tree_cast_preserves_kernel_scale_f32():
    """model.cast(bf16) after quantize_int8 must be lossless for the
    scales: tree_cast leaves kernel_scale leaves at float32 (a bf16
    round-trip would permanently quantize the per-channel scales)."""
    from tfimm_tpu.utils.tree import tree_cast

    scale = jnp.asarray([1.0 + 2 ** -12], jnp.float32)  # not bf16-exact
    tree = {"d": {"kernel_q": jnp.zeros((4, 4), jnp.int8),
                  "kernel_scale": scale,
                  "bias": jnp.zeros((4,), jnp.float32)}}
    out = tree_cast(tree, jnp.bfloat16)
    assert out["d"]["kernel_scale"].dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(out["d"]["kernel_scale"]),
                                  np.asarray(scale))
    assert out["d"]["bias"].dtype == jnp.bfloat16
    assert out["d"]["kernel_q"].dtype == jnp.int8


@pytest.mark.parametrize("skip_extra", [("qkv",), ("fc1",), ("fc2",)])
def test_partial_quantization_declines_fused_swin(monkeypatch, skip_extra):
    """The fused Swin block kernel reads qkv AND proj AND fc1 AND fc2 raw;
    a skip list that quantizes any subset must route the block to the XLA
    path instead of KeyError-ing at trace time (ADVICE r4). Geometry here
    QUALIFIES for the fused kernel (head_dim 32/16), so only the
    any_quantized gate stands between the partial tree and the crash."""
    from tfimm_tpu.architectures.swin import SwinTransformer, SwinTransformerConfig

    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    cfg = SwinTransformerConfig(
        name="swin_quant_gate_model", input_size=(32, 32), patch_size=4,
        embed_dim=64, nb_blocks=(1, 1), nb_heads=(2, 4), window_size=4,
        nb_classes=5)
    model = SwinTransformer(cfg)
    model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(9).uniform(size=(2, 32, 32, 3)), jnp.float32)
    ref = np.asarray(model(x))
    qp = quantize_int8(model.params, min_features=1,
                       skip=DEFAULT_SKIP + skip_extra)
    assert is_quantized(qp)
    out = np.asarray(model(x, params=qp))
    assert np.all(np.isfinite(out))
    assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-3) < 0.25


def test_partial_quantization_declines_fused_convnext(monkeypatch):
    """ConvNeXt's fused LN+MLP kernel reads fc1 AND fc2 raw; quantizing
    only fc2 (skip fc1) must fall back to XLA, not KeyError."""
    from tfimm_tpu.architectures.convnext import ConvNeXt, ConvNeXtConfig

    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    cfg = ConvNeXtConfig(
        name="convnext_quant_gate_model", input_size=(32, 32), patch_size=4,
        embed_dim=(128,), nb_blocks=(1,), nb_classes=5)
    model = ConvNeXt(cfg)
    model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.random.default_rng(10).uniform(size=(2, 32, 32, 3)), jnp.float32)
    ref = np.asarray(model(x))
    qp = quantize_int8(model.params, min_features=1,
                       skip=DEFAULT_SKIP + ("fc1",))
    assert is_quantized(qp)
    out = np.asarray(model(x, params=qp))
    assert np.all(np.isfinite(out))
    assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-3) < 0.25


def test_partial_quantization_declines_fused_poolformer(monkeypatch):
    """PoolFormer's opt-in fused block reads fc1 AND fc2 raw; with the
    kernel enabled and only fc2 quantized the gate must decline."""
    monkeypatch.setenv("TFIMM_TPU_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("TFIMM_TPU_FUSED_POOLFORMER", "1")
    model = create_model("poolformer_test_model")
    x = jnp.asarray(
        np.random.default_rng(11).uniform(size=(2, 32, 32, 3)), jnp.float32)
    ref = np.asarray(model(x))
    qp = quantize_int8(model.params, min_features=1,
                       skip=DEFAULT_SKIP + ("fc1",))
    assert is_quantized(qp)
    out = np.asarray(model(x, params=qp))
    assert np.all(np.isfinite(out))
    assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-3) < 0.25


# ---------------------------------------------------------------------------
# KxK conv quantization (round 5, quantize_int8(convs=True))
# ---------------------------------------------------------------------------


def test_conv_kxk_is_opt_in_and_win_region_gated():
    """K>1 conv kernels convert only with convs=True, only when BOTH
    channel dims clear min_conv_features (the measured v5e win region,
    results/int8_conv.csv); depthwise kernels never qualify."""
    rng = jax.random.PRNGKey(0)
    tree = {
        "big": {"kernel": jax.random.normal(rng, (3, 3, 128, 128))},
        "small": {"kernel": jax.random.normal(rng, (3, 3, 64, 64))},
        "dw": {"kernel": jax.random.normal(rng, (7, 7, 1, 256))},
        "stem": {"kernel": jax.random.normal(rng, (7, 7, 3, 128))},
    }
    assert not is_quantized(quantize_int8(tree))  # default: convs off
    qp = quantize_int8(tree, convs=True)
    assert qp["big"]["kernel_q"].shape == (3, 3, 128, 128)
    assert qp["big"]["kernel_q"].dtype == jnp.int8
    assert qp["big"]["kernel_scale"].shape == (128,)
    assert "kernel" not in qp["big"]
    for name in ("small", "dw", "stem"):
        assert "kernel" in qp[name] and "kernel_q" not in qp[name], name


def test_int8_conv_accuracy_and_dispatch():
    """A quantized KxK Conv2d stays within ~2% relative error of its float
    forward (per-tensor dynamic activation scale), including stride and
    symmetric padding, and the STE gradient flows to the input."""
    from tfimm_tpu.ops.conv import Conv2d

    conv = Conv2d(128, 128, 3, stride=2, padding=1, use_bias=True)
    p = conv.init(jax.random.PRNGKey(1))
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 8, 8, 128)),
                    jnp.float32)
    ref = np.asarray(conv(p, x))
    pq = quantize_int8({"c": p}, convs=True)["c"]
    assert pq["kernel_q"].ndim == 4
    out = np.asarray(conv(pq, x))
    assert out.shape == ref.shape
    assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-3) < 0.02

    g = jax.grad(lambda x_: conv(pq, x_).sum())(x)
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).max()) > 0.0


def test_stdconv_quantized_falls_back_to_standardized_float():
    """StdConv2d (ResNetV2/BiT) must keep weight standardization under
    quantized params: the int8 fast path is declined and the dequantized
    kernel is standardized — output matches the float layer closely."""
    from tfimm_tpu.ops.conv import StdConv2d

    conv = StdConv2d(128, 128, 3, padding=1, use_bias=False)
    p = conv.init(jax.random.PRNGKey(3))
    x = jnp.asarray(np.random.default_rng(4).normal(size=(2, 6, 6, 128)),
                    jnp.float32)
    ref = np.asarray(conv(p, x))
    pq = quantize_int8({"c": p}, convs=True)["c"]
    assert "kernel_q" in pq  # conversion itself is allowed...
    out = np.asarray(conv(pq, x))
    # ...but the output is the standardized-float conv, not an int8 conv:
    # standardization divides by the kernel std, so a skipped
    # standardization would be off by orders of magnitude, not percent.
    assert np.abs(out - ref).max() / max(np.abs(ref).max(), 1e-3) < 0.02


def test_resnet_fc_head_never_quantized():
    """timm names the classic-CNN classifier head exactly "fc" (ResNet's
    is a TOP-LEVEL "fc", not under "head") — it must stay float under
    both the default and the convs=True path, while fc1/fc2 MLP positions
    remain convertible (the exact-match rule must not shadow them)."""
    rng = jax.random.PRNGKey(7)
    tree = {
        "fc": {"kernel": jax.random.normal(rng, (512, 1000))},
        "blocks": {"0": {"mlp": {
            "fc1": {"kernel": jax.random.normal(rng, (512, 2048))},
            "fc2": {"kernel": jax.random.normal(rng, (2048, 512))},
        }}},
    }
    qp = quantize_int8(tree, convs=True)
    assert "kernel" in qp["fc"] and "kernel_q" not in qp["fc"]
    assert "kernel_q" in qp["blocks"]["0"]["mlp"]["fc1"]
    assert "kernel_q" in qp["blocks"]["0"]["mlp"]["fc2"]


def test_resnet_conv_quant_forward_close():
    """End-to-end: a ResNet test model quantized with convs=True stays
    close to its float forward and actually converts its wide 3x3s."""
    model = create_model("resnet_test_model")
    x = jnp.asarray(
        np.random.default_rng(6).uniform(size=model.dummy_inputs.shape),
        jnp.float32)
    ref = np.asarray(model.forward_features(model.params, x))
    qp = quantize_int8(model.params, convs=True, min_conv_features=4,
                       min_features=4)
    converted = [pth for pth, leaf in _flat_paths(qp).items()
                 if pth[-1] == "kernel_q" and leaf.ndim == 4]
    assert converted, "no conv kernels converted"
    out = np.asarray(model.forward_features(qp, x))
    drift = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-6)
    assert drift < 0.1, drift
