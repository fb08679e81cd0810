"""CLI renderer: single-frame, debug-view, and animation/batch output."""
import numpy as np
import pytest

from raytracevs_tpu.api import cli
from raytracevs_tpu.io.png import read_png


def test_cli_renders_png(tmp_path, sample_scene_path):
    out = tmp_path / "out.png"
    rc = cli.main([sample_scene_path, "-o", str(out), "-W", "32", "-H", "32",
                   "--spp", "1", "--bounces", "2", "--json"])
    assert rc == 0 and out.exists()
    img = read_png(str(out))
    assert img.shape == (32, 32, 4)
    assert img[:8, :, 2].mean() > img[:8, :, 0].mean()  # sky is blue


def test_cli_missing_scene_errors(tmp_path):
    rc = cli.main([str(tmp_path / "nope.rtvs"), "-o", str(tmp_path / "x.png")])
    assert rc == 1


def test_cli_orbit_animation_writes_frames(tmp_path, analytic_scene_path):
    """--orbit + --save-frames: a 3-frame camera orbit writes one PNG per
    frame; consecutive frames differ (the camera really moved) and the
    engine's temporal history is carried, not reset (geometry checksum
    excludes the camera)."""
    outdir = tmp_path / "anim"
    rc = cli.main([analytic_scene_path, "-o", str(tmp_path / "last.png"),
                   "-W", "32", "-H", "32", "--spp", "1", "--bounces", "2",
                   "--frames", "3", "--orbit", "12", "--denoise",
                   "--save-frames", str(outdir), "--json"])
    assert rc == 0
    frames = sorted(outdir.glob("frame_*.png"))
    assert [f.name for f in frames] == [
        "frame_0000.png", "frame_0001.png", "frame_0002.png"]
    imgs = [read_png(str(f)).astype(np.int32) for f in frames]
    assert np.abs(imgs[0] - imgs[1]).sum() > 0
    assert np.abs(imgs[1] - imgs[2]).sum() > 0
    # final --output equals the last animation frame
    last = read_png(str(tmp_path / "last.png"))
    np.testing.assert_array_equal(last, imgs[2].astype(np.uint8))
