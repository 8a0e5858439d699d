"""LoRA tests (reference: tests/models/test_lora.py): merged/unmerged layer
equivalence, registry semantics, round-trip identity, trainable accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import tfimm_tpu.architectures.lora as lora
from tfimm_tpu import create_model
from tfimm_tpu.architectures.lora.layers import LoRAConv2d, LoRADense, merge_kernel

from tests.models.architectures import TEST_ARCHITECTURES  # noqa: F401


def test_lora_dense_zero_init_is_identity():
    """Fresh B=0 means LoRA layer output == plain Dense output."""
    layer = LoRADense(8, 16, lora_rank=2)
    p = layer.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 8)), jnp.float32)
    base = jnp.dot(x, p["kernel"]) + p["bias"]
    np.testing.assert_allclose(np.asarray(layer(p, x)), np.asarray(base),
                               atol=1e-6)
    # 3D inputs too
    x3 = x.reshape(2, 2, 8)
    np.testing.assert_allclose(np.asarray(layer(p, x3)),
                               np.asarray(base).reshape(2, 2, 16), atol=1e-6)


def test_lora_dense_merge_equivalence():
    layer = LoRADense(8, 16, lora_rank=2, lora_alpha=3.0)
    p = layer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    p["kernel_lora_b"] = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(4, 8)), jnp.float32)
    merged = merge_kernel(p, layer.scaling)
    expected = jnp.dot(x, merged) + p["bias"]
    np.testing.assert_allclose(np.asarray(layer(p, x)), np.asarray(expected),
                               atol=1e-5)


def test_lora_conv_merge_equivalence():
    layer = LoRAConv2d(4, 8, 3, padding=1, lora_rank=2, lora_alpha=2.0)
    p = layer.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    p["kernel_lora_b"] = jnp.asarray(rng.normal(size=(3, 3, 2, 8)), jnp.float32)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    from tfimm_tpu.ops import Conv2d

    plain = Conv2d(4, 8, 3, padding=1)
    merged_p = {"kernel": merge_kernel(p, layer.scaling), "bias": p["bias"]}
    np.testing.assert_allclose(np.asarray(layer(p, x)),
                               np.asarray(plain(merged_p, x)), atol=1e-5)


def test_registry_semantics():
    from tfimm_tpu.architectures.convnext import ConvNeXt

    assert lora.lora_architecture(ConvNeXt) is lora.LoRAConvNeXt
    assert lora.lora_base_architecture(lora.LoRAConvNeXt) is ConvNeXt
    assert lora.lora_config(ConvNeXt) is lora.LoRAConvNeXtConfig
    with pytest.raises(ValueError):
        lora.lora_architecture(int)


def _tiny_convnext_kwargs():
    return dict(input_size=(32, 32), patch_size=4, embed_dim=(4, 4, 4, 4),
                nb_blocks=(1, 1, 1, 1), nb_classes=5)


def test_create_and_roundtrip_identity():
    model = lora.create_model("convnext_tiny", lora_rank=2, lora_alpha=4.0,
                              **_tiny_convnext_kwargs())
    assert isinstance(model, lora.LoRAConvNeXt)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(1, 32, 32, 3)),
                    jnp.float32)
    y_lora = model(x)

    # Fresh LoRA (B=0) must match the base model exactly.
    base = create_model("convnext_tiny", **_tiny_convnext_kwargs())
    lora.factory.transfer_weights(model, base)  # copy shared weights back
    np.testing.assert_allclose(np.asarray(y_lora), np.asarray(base(x)),
                               atol=1e-5)

    # Perturb LoRA factors, then convert to regular: outputs must be identical.
    import tfimm_tpu.utils.tree as tree

    flat = tree.flatten_params(model.params)
    rng = np.random.default_rng(4)
    for k in list(flat):
        if k.endswith("kernel_lora_b"):
            flat[k] = jnp.asarray(rng.normal(scale=0.05, size=flat[k].shape),
                                  jnp.float32)
    model.params = tree.unflatten_params(flat)
    y_lora = model(x)
    regular = lora.convert_to_regular_model(model)
    assert type(regular).__name__ == "ConvNeXt"
    np.testing.assert_allclose(np.asarray(regular(x)), np.asarray(y_lora),
                               atol=1e-5)


def test_convert_to_lora_model():
    base = create_model("convnext_tiny", **_tiny_convnext_kwargs())
    model = lora.convert_to_lora_model(base, lora_rank=2)
    x = jnp.asarray(np.random.default_rng(5).uniform(size=(1, 32, 32, 3)),
                    jnp.float32)
    np.testing.assert_allclose(np.asarray(model(x)), np.asarray(base(x)),
                               atol=1e-5)


def test_trainable_weight_accounting():
    model = lora.create_model("convnext_tiny", lora_rank=2,
                              **_tiny_convnext_kwargs())
    nb_blocks = sum(model.cfg.nb_blocks)

    # none: LoRA factors + classifier (lora_train_classifier=True by default)
    paths = model.trainable_weights
    lora_paths = [p for p in paths if "lora" in p]
    assert len(lora_paths) == 2 * 2 * nb_blocks  # a+b for fc1, fc2 per block
    assert any(p.startswith("head.fc") for p in paths)

    # all biases
    all_bias = lora.lora_trainable_weights(model, train_bias="all")
    assert all(p.endswith("bias") or "lora" in p for p in all_bias)
    nb_bias = len([p for p in all_bias if p.endswith("bias")])

    # lora_only biases: only fc1/fc2 biases
    lora_bias = lora.lora_trainable_weights(model, train_bias="lora_only")
    nb_lora_bias = len([p for p in lora_bias if p.endswith("bias")])
    assert nb_lora_bias == 2 * nb_blocks < nb_bias

    # trainable_layers by name
    named = lora.lora_trainable_weights(model, trainable_layers=["stem"])
    assert any(p.startswith("stem.") for p in named)

    # mask pytree matches params structure
    import jax

    mask = model.trainable_mask
    assert jax.tree.structure(mask) == jax.tree.structure(
        jax.tree.map(lambda _: True, model.params))


def test_lora_training_step_updates_only_lora():
    import optax

    model = lora.create_model("convnext_tiny", lora_rank=2,
                              **_tiny_convnext_kwargs())
    mask = model.trainable_mask
    tx = lora.factory.lora_optimizer(optax.sgd(0.1), model)
    opt_state = tx.init(model.params)

    x = jnp.asarray(np.random.default_rng(6).uniform(size=(2, 32, 32, 3)),
                    jnp.float32)
    labels = jnp.asarray([0, 1])

    def loss_fn(params):
        logits = model.apply(params, x, training=False)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    grads = jax.grad(loss_fn)(model.params)
    updates, _ = tx.update(grads, opt_state, model.params)
    new_params = optax.apply_updates(model.params, updates)

    from tfimm_tpu.utils.tree import flatten_params

    before, after = flatten_params(model.params), flatten_params(new_params)
    mask_flat = flatten_params(mask)
    for k in before:
        changed = not np.allclose(np.asarray(before[k]), np.asarray(after[k]))
        if changed:
            assert mask_flat[k], f"non-trainable param {k} changed"
