"""Multi-device tests on the 8-way virtual CPU mesh (conftest.py sets
--xla_force_host_platform_device_count=8)."""

import numpy as np

import jax
import jax.numpy as jnp
import optax

from tfimm_tpu import create_model
from tfimm_tpu.parallel import (
    create_mesh,
    infer_param_sharding,
    make_eval_step,
    make_train_step,
)

from tests.models.architectures import TEST_ARCHITECTURES  # noqa: F401


def test_mesh_creation():
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    mesh2 = create_mesh((4, 2))
    assert mesh2.shape == {"data": 4, "model": 2}


def test_param_sharding_tp_rules():
    model = create_model("vit_test_model", embed_dim=16, nb_heads=2)
    mesh = create_mesh((4, 2))
    shardings = infer_param_sharding(model.params, mesh)
    qkv = shardings["blocks"]["0"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == jax.sharding.PartitionSpec(None, "model")
    # Non-matching params replicated.
    assert shardings["cls_token"].spec == jax.sharding.PartitionSpec()


def test_data_parallel_train_step():
    model = create_model("vit_test_model")
    mesh = create_mesh()  # 8-way data parallel
    tx = optax.sgd(0.01)
    opt_state = tx.init(model.params)
    step = make_train_step(model, tx, mesh)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(size=(16, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, size=(16,)))
    params, opt_state, metrics = step(model.params, opt_state,
                                      (images, labels), jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # Params changed.
    before = model.params["head"]["kernel"]
    after = params["head"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))

    # Single-device step produces the same loss (sharding is semantics-free).
    step1 = make_train_step(model, tx, mesh=None)
    _, _, metrics1 = step1(model.params, tx.init(model.params),
                           (images, labels), jax.random.PRNGKey(0))
    np.testing.assert_allclose(float(metrics["loss"]), float(metrics1["loss"]),
                               rtol=1e-5)


def test_tensor_parallel_train_step():
    model = create_model("vit_test_model", embed_dim=16, nb_heads=2)
    mesh = create_mesh((2, 4))  # 2-way data x 4-way tensor parallel
    tx = optax.adamw(1e-3)
    opt_state = tx.init(model.params)
    step = make_train_step(model, tx, mesh)
    rng = np.random.default_rng(1)
    images = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, size=(4,)))
    params, opt_state, metrics = step(model.params, opt_state,
                                      (images, labels), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_eval_step_sharded_matches_unsharded():
    model = create_model("vit_test_model")
    mesh = create_mesh()
    rng = np.random.default_rng(2)
    images = jnp.asarray(rng.uniform(size=(8, 32, 32, 3)), jnp.float32)
    y_sharded = make_eval_step(model, mesh)(model.params, images)
    y_local = make_eval_step(model)(model.params, images)
    np.testing.assert_allclose(np.asarray(y_sharded), np.asarray(y_local),
                               atol=1e-5)


def test_remat_train_step_matches():
    """Rematerialized step produces the same loss/updates as the plain step."""
    model = create_model("vit_test_model")
    tx = optax.sgd(0.01)
    rng = np.random.default_rng(9)
    images = jnp.asarray(rng.uniform(size=(4, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, size=(4,)))
    key = jax.random.PRNGKey(0)

    step = make_train_step(model, tx)
    step_r = make_train_step(model, tx, remat=True)
    p1, _, m1 = step(model.params, tx.init(model.params), (images, labels), key)
    p2, _, m2 = step_r(model.params, tx.init(model.params), (images, labels), key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(p1["head"]["kernel"]), np.asarray(p2["head"]["kernel"]),
        atol=1e-6)


def test_train_step_merges_bn_stats():
    """BatchNorm running stats update through the sharded train step."""
    model = create_model("resnet_test_model", nb_classes=4)
    tx = optax.sgd(0.01)
    step = make_train_step(model, tx)
    rng = np.random.default_rng(10)
    images = jnp.asarray(rng.uniform(size=(8, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 4, size=(8,)))
    before = np.asarray(model.params["bn1"]["mean"])
    params, _, metrics = step(model.params, tx.init(model.params),
                              (images, labels), jax.random.PRNGKey(0))
    after = np.asarray(params["bn1"]["mean"])
    assert not np.allclose(before, after), "running mean should move"
    assert np.isfinite(float(metrics["loss"]))


def test_fsdp_param_sharding_specs():
    """Large leaves get the data axis on their largest free dim; small leaves
    stay replicated; TP-ruled leaves keep the model axis."""
    from tfimm_tpu.parallel import fsdp_param_sharding

    model = create_model("vit_test_model", embed_dim=16, nb_heads=2)
    mesh = create_mesh((4, 2))
    shardings = fsdp_param_sharding(model.params, mesh, min_leaf_size=128)
    P = jax.sharding.PartitionSpec
    # qkv kernel (16, 48): the TP rule puts "model" on the output dim; FSDP
    # adds "data" on the remaining free dim.
    qkv = shardings["blocks"]["0"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == P("data", "model")
    # Patch-embed kernel is large, no TP rule: data axis on its largest dim.
    pe = shardings["patch_embed"]["proj"]["kernel"]
    assert "data" in pe.spec
    # Tiny leaves (norm scales) stay replicated.
    assert shardings["norm"]["scale"].spec == P()


def test_fsdp_train_step_matches_replicated():
    """FSDP-sharded training computes exactly the same step as replicated."""
    from tfimm_tpu.parallel import fsdp_param_sharding

    model = create_model("vit_test_model")
    mesh = create_mesh()  # 8-way data
    tx = optax.adamw(1e-3)
    p_shard = fsdp_param_sharding(model.params, mesh, min_leaf_size=64)
    step_fsdp = make_train_step(model, tx, mesh, param_sharding=p_shard)
    step_rep = make_train_step(model, tx, mesh)

    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.uniform(size=(16, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 1000, size=(16,)))
    key = jax.random.PRNGKey(0)
    p1, s1, m1 = step_fsdp(model.params, tx.init(model.params),
                           (images, labels), key)
    p2, s2, m2 = step_rep(model.params, tx.init(model.params),
                          (images, labels), key)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p1["head"]["kernel"]),
                               np.asarray(p2["head"]["kernel"]), atol=1e-5)


def test_opt_state_sharding_follows_params():
    from tfimm_tpu.parallel import fsdp_param_sharding, opt_state_sharding

    model = create_model("vit_test_model")
    mesh = create_mesh()
    tx = optax.adamw(1e-3)
    p_shard = fsdp_param_sharding(model.params, mesh, min_leaf_size=64)
    opt_shard = opt_state_sharding(tx, model.params, p_shard, mesh)
    # adamw opt state is (ScaleByAdamState, ...); mu mirrors the param tree.
    adam_state = opt_shard[0]
    assert adam_state.mu["head"]["kernel"].spec == \
        p_shard["head"]["kernel"].spec
    # The step counter is replicated.
    assert adam_state.count.spec == jax.sharding.PartitionSpec()


def test_spatial_sharding_forward_matches_replicated():
    """sp: input sharded over batch AND image height — GSPMD propagates the
    spatial sharding (halo exchanges for convs / gathers for attention) and
    the result matches the replicated forward."""
    from tfimm_tpu.parallel import spatial_sharding

    model = create_model("vit_test_model")  # 32x32 input, patch 8
    mesh = create_mesh((2, 4), ("data", "seq"))
    rng = np.random.default_rng(7)
    images = jnp.asarray(rng.uniform(size=(8, 32, 32, 3)), jnp.float32)
    ref = np.asarray(model.predict(images))

    sharded = jax.device_put(images, spatial_sharding(mesh))
    with mesh:
        out = jax.jit(
            lambda p, x: model.apply(p, x, training=False)
        )(model.params, sharded)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)
