"""Offline golden-fixture parity: the full create_model -> convert chain vs
ground truth produced by INDEPENDENT PyTorch implementations.

Fixtures (tests/fixtures/golden/*.npz) were generated once by
scripts/make_golden_fixtures.py and scripts/make_golden_fixtures_ref.py from:
  * the reference checkout's vendored third-party code (sail-sg PoolFormer,
    whai362 PVT/PVTv2 — the same files the reference's own parity tests use
    as ground truth, reference: tests/test_timm.py:38-71),
  * HuggingFace transformers (ViT, ConvNeXt, Swin, ResNet, BiT,
    EfficientNet),
  * the reference's own TensorFlow models (ref_*: CaiT, MLP-Mixer, gMLP,
    PiT, VGG, ConvMixer, ViT-Hybrid — families with no independent PyTorch
    source in this image; TF variables are inverted to timm keys through the
    reference's own mechanical mapping, tfimm/utils/timm.py:39).
All 16 architecture families are covered.

Unlike tests/test_pt_parity.py (whose torch refs live in this repo), none of
this ground truth was authored here — a shared misunderstanding between our
JAX models and our torch refs cannot pass silently. Each fixture carries the
complete PT state_dict, a fixed input, and the fp32 eval-mode output; the
test replays the exact pretrained-loading path (create_model with config
overrides, then convert_pt_state_dict) without network access.
"""

import glob
import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from tfimm_tpu import create_model
from tfimm_tpu.utils.pt_convert import load_pt_state_dict

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "fixtures", "golden")
# sam.npz is component-level and consumed by tests/models/test_sam_golden.py.
FIXTURES = sorted(p for p in glob.glob(os.path.join(FIXTURE_DIR, "*.npz"))
                  if not p.endswith("sam.npz"))


def _load(path):
    data = np.load(path)
    meta = json.loads(bytes(data["meta"]).decode())
    sd = {k[len("sd::"):]: data[k] for k in data.files if k.startswith("sd::")}
    return meta, sd, data["input"], data["output"]


@pytest.mark.parametrize(
    "path", FIXTURES, ids=[os.path.basename(p)[:-4] for p in FIXTURES]
)
def test_golden_parity(path):
    meta, sd, inp, golden = _load(path)
    kwargs = dict(meta["kwargs"])
    kwargs = {k: tuple(v) if isinstance(v, list) else v
              for k, v in kwargs.items()}
    model = create_model(meta["model_name"], **kwargs)
    load_pt_state_dict(model, sd)

    out = np.asarray(model(jnp.asarray(inp)))
    assert out.shape == golden.shape
    scale = max(np.abs(golden).max(), 1e-6)
    rel_err = np.abs(out - golden).max() / scale
    # Reference CI bar is 1e-3 relative (tests/test_timm.py:71); we match it
    # and usually do far better.
    assert rel_err < 1e-3, (
        f"{meta['model_name']} vs {meta['source']}: rel err {rel_err:.2e}"
    )


def test_fixtures_exist():
    assert len(FIXTURES) >= 17, (
        f"expected committed golden fixtures covering all 16 families in "
        f"{FIXTURE_DIR}, found {len(FIXTURES)} — run "
        f"scripts/make_golden_fixtures.py + make_golden_fixtures_ref.py"
    )
