"""App driver end-to-end via main() (in-process, CPU)."""

import numpy as np
import pytest

from vulkan_pathtracer_tpu.app.main import main
from vulkan_pathtracer_tpu.utils.cli import parse_args
from vulkan_pathtracer_tpu.utils.png import read_png


def test_missing_scene_path_exits():
    with pytest.raises(SystemExit):
        parse_args([])


def test_cli_defaults_match_reference():
    config, args = parse_args(["-s", "x.glb"])
    assert config.num_samples == 1
    assert config.num_bounces == 2
    assert config.resolution_x == 1920
    assert config.resolution_y == 1080
    assert config.render_resolution_divider == 1
    assert config.enable_validation is False


def test_main_renders_png(box_glb, tmp_path):
    out = str(tmp_path / "out.png")
    rc = main(["-s", box_glb, "-x", "32", "-y", "24", "-o", out,
               "--frames", "1"])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (24, 32, 3)


def test_main_progressive_resume(box_glb, tmp_path):
    out = str(tmp_path / "prog.png")
    ckpt = str(tmp_path / "acc.npz")
    rc = main(["-s", box_glb, "-x", "16", "-y", "16", "-o", out,
               "--progressive", "--frames", "2",
               "--checkpoint", ckpt, "--checkpoint-interval", "1"])
    assert rc == 0
    rc = main(["-s", box_glb, "-x", "16", "-y", "16", "-o", out,
               "--progressive", "--frames", "4",
               "--checkpoint", ckpt, "--checkpoint-interval", "1"])
    assert rc == 0
    import json

    data = np.load(ckpt, allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    assert meta["frame"] == 4 and meta["spp"] == 4


def test_main_divider_output_size(box_glb, tmp_path):
    out = str(tmp_path / "div.png")
    rc = main(["-s", box_glb, "-x", "32", "-y", "32", "-d", "2",
               "-o", out, "--frames", "1"])
    assert rc == 0
    img = read_png(out)
    assert img.shape == (32, 32, 3)  # presented at full size


def test_batched_progressive_matches_per_frame(box_glb, tmp_path):
    """--batch-frames renders identical accumulation to per-frame."""
    out_a = str(tmp_path / "a.png")
    out_b = str(tmp_path / "b.png")
    base = ["-s", box_glb, "-x", "16", "-y", "16", "--progressive",
            "--frames", "4"]
    assert main(base + ["-o", out_a]) == 0
    assert main(base + ["-o", out_b, "--batch-frames", "4"]) == 0
    a = read_png(out_a).astype(int)
    b = read_png(out_b).astype(int)
    assert np.abs(a - b).max() <= 1  # f32 sum-order 1-ulp -> <=1 level
