"""Distillation problem + full run() config-path tests."""

import numpy as np


from tfimm_tpu.train import (
    ArrayDataset,
    ArrayDatasetConfig,
    DistillationConfig,
    DistillationProblem,
    ModelConfig,
    OptimizerConfig,
    Timekeeping,
)
from tfimm_tpu.train.optimizers import LRConstConfig

import tests.models.architectures  # noqa: F401


def test_distillation_problem_learns():
    tk = Timekeeping(nb_epochs=1, batch_size=8, nb_samples_per_epoch=16)
    cfg = DistillationConfig(
        teacher=ModelConfig(model_name="vit_test_model", nb_classes=0),
        teacher_class="ModelFactory",
        student=ModelConfig(model_name="vit_test_model", nb_classes=0),
        student_class="ModelFactory",
        optimizer=OptimizerConfig(lr_schedule=LRConstConfig(lr=0.05),
                                  lr_schedule_class="LRConstFactory",
                                  optimizer="adam"),
        optimizer_class="OptimizerFactory",
    )
    problem = DistillationProblem(cfg, timekeeping=tk)
    # Teacher and student are built identically (same seed) -> re-init the
    # student so there is actually something to learn.
    problem.params = problem.student.init(123)
    problem.opt_state = problem.tx.init(problem.params)
    rng = np.random.default_rng(0)
    images = rng.uniform(0, 255, size=(8, 32, 32, 3)).astype("float32")
    loss0, _ = problem.train_step((images,), 0)
    for it in range(10):
        loss, _ = problem.train_step((images,), it)
    assert loss < loss0  # student embeddings move toward the teacher


def test_run_via_config(tmp_path):
    """Full run() through the _class config system with dict defaults."""
    from tfimm_tpu.train import run

    rng = np.random.default_rng(1)
    data = (rng.uniform(0, 255, size=(16, 32, 32, 3)).astype("float32"),
            rng.integers(0, 4, size=(16,)))

    # ArrayDataset needs a data source, so register a tiny subclass.
    from dataclasses import dataclass

    from tfimm_tpu.train.datasets import ArrayDataset, ArrayDatasetConfig
    from tfimm_tpu.train.registry import cfg_serializable

    @dataclass
    class ToyDataConfig(ArrayDatasetConfig):
        pass

    @cfg_serializable
    class ToyData(ArrayDataset):
        cfg_class = ToyDataConfig

        def __init__(self, cfg):
            super().__init__(cfg, data=data)

    cfg = {
        "trainer_class": "Trainer",
        "trainer": {"ckpt_dir": str(tmp_path / "run"),
                    "validation_before_training": False,
                    "display_loss_every_it": -1},
        "problem_class": "ClassificationProblem",
        "problem": {
            "model_class": "ModelFactory",
            "model": {"model_name": "vit_test_model", "nb_classes": 4},
            "optimizer_class": "OptimizerFactory",
            "optimizer": {"optimizer": "adam",
                          "lr_schedule_class": "LRConstFactory",
                          "lr_schedule": {"lr": 0.01}},
        },
        "train_dataset_class": "ToyData",
        "train_dataset": {"batch_size": 8},
        "timekeeping_class": "Timekeeping",
        "timekeeping": {"nb_epochs": 1, "batch_size": 8,
                        "nb_samples_per_epoch": 16},
    }
    trainer = run(cfg, parse_cmdline_args=False)
    assert trainer.problem.epoch == 1
    logs = trainer.problem.validation(ToyData(ToyDataConfig(batch_size=8,
                                                            shuffle=False)))
    assert 0.0 <= logs["val/accuracy"] <= 1.0


def test_run_parses_dict_config(tmp_path):
    from tfimm_tpu.train.config import parse_args
    from tfimm_tpu.train.train import ExperimentConfig

    cfg = parse_args(
        {"timekeeping_class": "Timekeeping"},
        cfg_class=ExperimentConfig,
        args=["--timekeeping.nb_epochs=2", "--timekeeping.batch_size=4",
              "--timekeeping.nb_samples_per_epoch=8"],
    )
    assert cfg.timekeeping.nb_epochs == 2
    assert cfg.timekeeping.batch_size == 4


def test_classification_ema_and_mixup():
    """EMA params trail the live params and are used for validation;
    mixup produces soft labels inside the step without breaking metrics."""
    import jax
    import numpy as np
    from tfimm_tpu.train import (
        ArrayDataset,
        ArrayDatasetConfig,
        ClassificationConfig,
        ClassificationProblem,
        ModelConfig,
        OptimizerConfig,
        Timekeeping,
    )
    from tfimm_tpu.train.optimizers import LRConstConfig
    from tfimm_tpu.utils.tree import flatten_params

    tk = Timekeeping(nb_epochs=1, batch_size=8)
    cfg = ClassificationConfig(
        model=ModelConfig(model_name="vit_test_model", nb_classes=4),
        model_class="ModelFactory",
        optimizer=OptimizerConfig(
            lr_schedule=LRConstConfig(lr=0.05),
            lr_schedule_class="LRConstFactory",
            optimizer="adam",
        ),
        optimizer_class="OptimizerFactory",
        ema_decay=0.5,
        mixup_alpha=0.8,
        cutmix_alpha=1.0,
        label_smoothing=0.1,
    )
    problem = ClassificationProblem(cfg, timekeeping=tk)
    init = flatten_params(problem.params)

    rng = np.random.default_rng(1)
    images = rng.uniform(0, 255, size=(8, 32, 32, 3)).astype("float32")
    labels = rng.integers(0, 4, size=(8,))
    for it in range(3):
        loss, logs = problem.train_step((images, labels), it)
        assert np.isfinite(loss)

    live = flatten_params(problem.params)
    ema = flatten_params(problem.ema_params)
    key = "head.kernel"
    assert not np.allclose(np.asarray(live[key]), np.asarray(init[key]))
    # EMA lies strictly between the init and the live weights.
    d_live = float(np.abs(np.asarray(live[key]) - np.asarray(init[key])).max())
    d_ema = float(np.abs(np.asarray(ema[key]) - np.asarray(init[key])).max())
    assert 0.0 < d_ema < d_live
    # state round-trips the EMA; model_only warm start resets it.
    state = problem.state
    assert "ema_params" in state
    problem.set_state(state, model_only=True)
    np.testing.assert_allclose(
        np.asarray(flatten_params(problem.ema_params)[key]),
        np.asarray(live[key]))
    # validation runs on EMA params without error.
    ds = ArrayDataset(ArrayDatasetConfig(batch_size=8),
                      data=(images, labels))
    logs = problem.validation(ds)
    assert 0.0 <= logs["val/accuracy"] <= 1.0
