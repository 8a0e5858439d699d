"""ImageNet normalization constants (reference: tfimm/utils/constants.py:1-6)."""

# v5e per-chip bf16 dense peak (MXU): the roofline denominator used by
# bench.py and every scripts/perf sweep. One definition — per-script copies
# of this number drifted once (see bench.py's flops.csv note).
V5E_BF16_PEAK_FLOPS = 197e12

IMAGENET_DEFAULT_MEAN = (0.485, 0.456, 0.406)
IMAGENET_DEFAULT_STD = (0.229, 0.224, 0.225)
IMAGENET_INCEPTION_MEAN = (0.5, 0.5, 0.5)
IMAGENET_INCEPTION_STD = (0.5, 0.5, 0.5)
