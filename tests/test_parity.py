"""Image parity vs the reference renderer.

The goldens in parity/golden/ were rendered by the REFERENCE implementation
itself (parity/src/parity_cornell.cpp: the reference headers built out-of-tree
with the parity/tgd shim, scene = wurblpt-cornellbox.cpp default config, which
utils/cornell_data.py replicates vertex-for-vertex). The 2500 spp golden is the
converged target; the 16 spp golden calibrates the reference's own Monte-Carlo
noise floor at equal sample count.

Row order: the reference writes pixel row 0 at the BOTTOM (image convention);
ours is row 0 at top, so goldens are flipped on load.
"""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "parity"))
import tgdshim  # noqa: E402

from wurblpt_tpu import (  # noqa: E402
    CameraConfig,
    RenderParams,
    SceneStatic,
    SensorRGB,
    make_camera,
)
from wurblpt_tpu.render.integrator import render_frame  # noqa: E402
from wurblpt_tpu.utils import scenes  # noqa: E402

GOLDEN_DIR = Path(__file__).resolve().parent.parent / "parity" / "golden"


def _load_golden(name):
    img, tags = tgdshim.load(GOLDEN_DIR / name)
    return np.asarray(img, np.float32)[::-1], tags  # flip to row-0-at-top


def _render_ours(w, h, ssqrt, max_depth=32):
    arrays = scenes.cornell_box_ref().build()
    static = SceneStatic.from_scene(arrays)
    pose, vfov = scenes.cornell_ref_camera()
    cam = make_camera(transformation=pose, vfov_deg=vfov, width=w, height=h)
    return np.asarray(
        render_frame(arrays, static, cam, CameraConfig(), SensorRGB(), w, h,
                     ssqrt, params=RenderParams(max_path_components=max_depth),
                     samples_per_pass=min(ssqrt * ssqrt, 8))
    )


def test_cornell_parity_vs_reference_golden():
    """Our 64x64 render must match the (downsampled) converged reference golden
    about as well as the reference's own equal-spp render does."""
    ref2500, _ = _load_golden("ref_cornell_128_2500spp.tgdshim")
    ref16, _ = _load_golden("ref_cornell_128_16spp.tgdshim")

    # Box-downsample 128 -> 64: pixel jitter is uniform over the footprint, so
    # a 64x64 render equals the 2x2 average of the 128x128 image in expectation.
    ref_lo = ref2500.reshape(64, 2, 64, 2, 3).mean((1, 3))

    ours = _render_ours(64, 64, 4)  # 16 spp

    scale = max(float(ref_lo.mean()), 1e-9)
    mean_rel = float(np.abs(ours - ref_lo).mean()) / scale
    # Reference's own 16spp-vs-converged noise at this resolution:
    ref_self = float(
        np.abs(ref16.reshape(64, 2, 64, 2, 3).mean((1, 3)) - ref_lo).mean()
    ) / scale
    assert mean_rel < max(2.0 * ref_self, 0.10), (mean_rel, ref_self)
    # Unbiasedness: global means agree to well under the noise floor.
    assert abs(float(ours.mean()) - float(ref_lo.mean())) / scale < 0.02
    # Per-channel means (color balance) agree too.
    np.testing.assert_allclose(ours.mean((0, 1)), ref_lo.mean((0, 1)),
                               rtol=0.03)


def test_cornell_parity_quantiles():
    """Distribution match: luminance quantiles of ours-vs-golden line up."""
    ref2500, _ = _load_golden("ref_cornell_128_2500spp.tgdshim")
    ref_lo = ref2500.reshape(64, 2, 64, 2, 3).mean((1, 3))
    ours = _render_ours(64, 64, 4)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        a = float(np.quantile(ours.sum(-1), q))
        b = float(np.quantile(ref_lo.sum(-1), q))
        assert abs(a - b) <= 0.10 * max(b, 0.02) + 0.004, (q, a, b)
