"""End-to-end trainer test: a tiny classification problem on synthetic data,
with checkpoint save + crash-resume (reference has NO trainer test — this
exceeds its coverage)."""

import numpy as np

from tfimm_tpu.train import (
    ArrayDataset,
    ArrayDatasetConfig,
    ClassificationConfig,
    ClassificationProblem,
    ModelConfig,
    OptimizerConfig,
    Timekeeping,
    Trainer,
    TrainerConfig,
)
from tfimm_tpu.train.optimizers import LRConstConfig

import tests.models.architectures  # noqa: F401 (registers vit_test_model)


def _make_problem(tk):
    cfg = ClassificationConfig(
        model=ModelConfig(model_name="vit_test_model", nb_classes=4),
        model_class="ModelFactory",
        optimizer=OptimizerConfig(
            lr_schedule=LRConstConfig(lr=0.05),
            lr_schedule_class="LRConstFactory",
            optimizer="adam",
        ),
        optimizer_class="OptimizerFactory",
    )
    return ClassificationProblem(cfg, timekeeping=tk)


def _make_data(n=32):
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(n, 32, 32, 3)).astype("float32")
    labels = rng.integers(0, 4, size=(n,))
    return images, labels


def test_trainer_end_to_end(tmp_path):
    tk = Timekeeping(nb_epochs=6, batch_size=8, nb_samples_per_epoch=32)
    data = _make_data()
    train_ds = ArrayDataset(ArrayDatasetConfig(batch_size=8), data=data)
    val_ds = ArrayDataset(ArrayDatasetConfig(batch_size=8, shuffle=False),
                          data=data)
    problem = _make_problem(tk)
    trainer = Trainer(
        problem=problem, train_ds=train_ds, val_ds=val_ds, timekeeping=tk,
        cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          validation_before_training=True,
                          display_loss_every_it=2),
    )
    trainer.train()
    # Model memorizes tiny synthetic set reasonably.
    logs = problem.validation(val_ds)
    assert logs["val/accuracy"] > 0.3
    assert problem.epoch == 6
    # Deployment export happened.
    assert (tmp_path / "ckpt" / "model" / "config.json").exists()

    # Crash-resume: fresh problem + trainer resume from latest checkpoint.
    problem2 = _make_problem(tk)
    trainer2 = Trainer(
        problem=problem2, train_ds=train_ds, val_ds=None, timekeeping=tk,
        cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                          resume_from_ckpt=True,
                          validation_before_training=False),
    )
    trainer2._load_ckpt()
    assert problem2.epoch == 6  # fully trained; loop would exit immediately
    np.testing.assert_allclose(
        np.asarray(problem2.params["head"]["kernel"]),
        np.asarray(problem.params["head"]["kernel"]),
    )


def test_init_ckpt_warm_start(tmp_path):
    tk = Timekeeping(nb_epochs=1, batch_size=8, nb_samples_per_epoch=16)
    data = _make_data(16)
    train_ds = ArrayDataset(ArrayDatasetConfig(batch_size=8), data=data)
    problem = _make_problem(tk)
    trainer = Trainer(problem=problem, train_ds=train_ds, val_ds=None,
                      timekeeping=tk,
                      cfg=TrainerConfig(ckpt_dir=str(tmp_path / "first"),
                                        validation_before_training=False))
    trainer.train()

    # Warm start: model weights restored, but epoch counter reset (model_only).
    problem2 = _make_problem(tk)
    trainer2 = Trainer(problem=problem2, train_ds=train_ds, val_ds=None,
                       timekeeping=tk,
                       cfg=TrainerConfig(init_ckpt=str(tmp_path / "first"),
                                         resume_from_ckpt=False,
                                         validation_before_training=False))
    trainer2._load_ckpt()
    assert problem2.epoch == 0
    np.testing.assert_allclose(
        np.asarray(problem2.params["head"]["kernel"]),
        np.asarray(problem.params["head"]["kernel"]),
    )


def test_trainer_resume_restores_ema(tmp_path):
    """EMA params ride the orbax checkpoint through a crash-resume."""
    from tfimm_tpu.train import ClassificationConfig, ClassificationProblem

    def make_problem(tk):
        cfg = ClassificationConfig(
            model=ModelConfig(model_name="vit_test_model", nb_classes=4),
            model_class="ModelFactory",
            optimizer=OptimizerConfig(
                lr_schedule=LRConstConfig(lr=0.05),
                lr_schedule_class="LRConstFactory",
                optimizer="adam",
            ),
            optimizer_class="OptimizerFactory",
            ema_decay=0.9,
        )
        return ClassificationProblem(cfg, timekeeping=tk)

    tk = Timekeeping(nb_epochs=1, batch_size=8, nb_samples_per_epoch=16)
    data = _make_data(16)
    train_ds = ArrayDataset(ArrayDatasetConfig(batch_size=8), data=data)
    problem = make_problem(tk)
    trainer = Trainer(problem=problem, train_ds=train_ds, val_ds=None,
                      timekeeping=tk,
                      cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                                        validation_before_training=False))
    trainer.train()
    ema_after = np.asarray(problem.ema_params["head"]["kernel"])
    live_after = np.asarray(problem.params["head"]["kernel"])
    assert not np.allclose(ema_after, live_after)  # EMA trails the live params

    problem2 = make_problem(tk)
    trainer2 = Trainer(problem=problem2, train_ds=train_ds, val_ds=None,
                       timekeeping=tk,
                       cfg=TrainerConfig(ckpt_dir=str(tmp_path / "ckpt"),
                                         resume_from_ckpt=True,
                                         validation_before_training=False))
    trainer2._load_ckpt()
    np.testing.assert_allclose(
        np.asarray(problem2.ema_params["head"]["kernel"]), ema_after)
    np.testing.assert_allclose(
        np.asarray(problem2.params["head"]["kernel"]), live_after)
