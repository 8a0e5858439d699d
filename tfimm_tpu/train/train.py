"""Experiment runner (reference: tfimm/train/train.py:19-108).

``run()``: parse args/YAML -> setup logging -> dump config -> optional W&B ->
instantiate datasets/problem/trainer via the class registry -> train.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass
from typing import Any

from tfimm_tpu.train.config import dump_config, parse_args, pprint
from tfimm_tpu.train.registry import get_class
from tfimm_tpu.train.utils import setup_logging

__all__ = ["ExperimentConfig", "run"]


@dataclass
class ExperimentConfig:
    trainer: Any = None
    trainer_class: str = ""
    problem: Any = None
    problem_class: str = ""
    train_dataset: Any = None
    train_dataset_class: str = ""
    val_dataset: Any = None
    val_dataset_class: str = ""
    timekeeping: Any = None
    timekeeping_class: str = "Timekeeping"
    # Device mesh spec, e.g. "data:8", "data:4,model:2", or "data" (= all
    # devices, pure data parallel). Empty = single-device. The problem's
    # train/eval steps are jit-sharded over this mesh (parallel/step.py);
    # see ClassificationConfig.param_sharding for the parameter layout.
    mesh: str = ""
    log_level: str = "INFO"
    # Weights & Biases (optional)
    log_wandb: bool = False
    experiment_name: str = "default"
    project_name: str = "default"
    entity: str = ""
    # Config file support
    cfg_file: str = ""


def run(cfg=None, parse_cmdline_args: bool = True):
    """Run an experiment. ``cfg`` may be an ExperimentConfig, a dict of
    defaults, or None; command-line arguments override it."""
    import tfimm_tpu.train  # noqa: F401  (registers classes)

    if not isinstance(cfg, ExperimentConfig) or parse_cmdline_args:
        cfg = parse_args(cfg or {}, cfg_class=ExperimentConfig,
                         args=None if parse_cmdline_args else [])
    setup_logging(cfg.log_level)
    logging.info("Experiment config:")
    pprint(cfg)

    ckpt_dir = getattr(cfg.trainer, "ckpt_dir", "") if cfg.trainer else ""
    wandb_run = None
    if cfg.log_wandb:
        try:
            import wandb

            wandb_run = wandb.init(
                project=cfg.project_name, entity=cfg.entity or None,
                name=cfg.experiment_name, config=None,
            )
            # Sweep runs get per-run checkpoint dirs to avoid clobbering
            # (reference: train.py:78-88).
            if ckpt_dir and wandb.run is not None and wandb.run.sweep_id:
                ckpt_dir = os.path.join(ckpt_dir, wandb.run.id)
                cfg.trainer.ckpt_dir = ckpt_dir
        except ImportError:
            logging.warning("wandb not installed; disabling W&B logging.")
            cfg.log_wandb = False

    if ckpt_dir:
        dump_config(cfg, os.path.join(ckpt_dir, "config.yaml"))

    mesh = None
    if cfg.mesh:
        from tfimm_tpu.parallel import parse_mesh_spec

        mesh = parse_mesh_spec(cfg.mesh)
        logging.info(f"Device mesh: {dict(mesh.shape)} "
                     f"({mesh.devices.size} devices)")

    timekeeping = cfg.timekeeping
    train_ds = (get_class(cfg.train_dataset_class)(cfg=cfg.train_dataset)
                if cfg.train_dataset_class else None)
    val_ds = (get_class(cfg.val_dataset_class)(cfg=cfg.val_dataset)
              if cfg.val_dataset_class else None)
    problem_kwargs = {"cfg": cfg.problem, "timekeeping": timekeeping}
    if mesh is not None:
        problem_kwargs["mesh"] = mesh
    problem = get_class(cfg.problem_class)(**problem_kwargs)
    trainer = get_class(cfg.trainer_class)(
        problem=problem, train_ds=train_ds, val_ds=val_ds,
        timekeeping=timekeeping, cfg=cfg.trainer, log_wandb=cfg.log_wandb,
    )
    trainer.train()
    if wandb_run is not None:
        wandb_run.finish()
    return trainer
