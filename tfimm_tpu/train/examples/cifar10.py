"""CIFAR-10 end-to-end example (reference: tfimm/train/examples/cifar10.py).

Run with python-config mode:

    python -m tfimm_tpu.train.examples.cifar10

or CLI/YAML mode via run_local:

    python -m tfimm_tpu.train.run_local \
        --trainer_class=Trainer --problem_class=ClassificationProblem \
        --problem.model_class=ModelFactory \
        --problem.model.model_name=resnet18 ...

Requires tensorflow_datasets for real CIFAR-10; otherwise substitute
ArrayDataset with your own data.
"""

from tfimm_tpu.train import run


def main():
    cfg = {
        "trainer_class": "Trainer",
        "trainer": {
            "ckpt_dir": "/tmp/tfimm_tpu_cifar10",
            "display_loss_every_it": 50,
            "validation_before_training": False,
        },
        "problem_class": "ClassificationProblem",
        "problem": {
            "model_class": "ModelFactory",
            "model": {
                "model_name": "resnet18",
                "input_size": (32, 32),
                "nb_classes": 10,
            },
            "optimizer_class": "OptimizerFactory",
            "optimizer": {
                "optimizer": "adamw",
                "lr_schedule_class": "LRCosineDecayFactory",
                "lr_schedule": {"lr": 1e-3},
                "lr_warmup": 1,
            },
            "mixed_precision": True,
        },
        "train_dataset_class": "TFDSWrapper",
        "train_dataset": {
            "dataset_name": "cifar10",
            "split": "train",
            "batch_size": 256,
            "shuffle": True,
        },
        "val_dataset_class": "TFDSWrapper",
        "val_dataset": {
            "dataset_name": "cifar10",
            "split": "test",
            "batch_size": 256,
            "shuffle": False,
        },
        "timekeeping": {
            "nb_epochs": 10,
            "batch_size": 256,
            "nb_samples_per_epoch": 50000,
        },
    }
    run(cfg, parse_cmdline_args=True)


if __name__ == "__main__":
    main()
