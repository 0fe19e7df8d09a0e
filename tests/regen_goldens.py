"""Regenerate golden images (run from the repo root, CPU backend)."""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from assets.procedural import (  # noqa: E402
    make_box,
    make_cornell,
    make_textured_sphere,
)
from tests.golden_utils import (  # noqa: E402
    GOLDEN_CONFIGS,
    render_golden,
    write_golden,
)

MAKERS = {
    "box": make_box,
    "cornell": make_cornell,
    "sphere": lambda p: make_textured_sphere(p, lat=16, lon=32),
}


def main():
    tmp = tempfile.mkdtemp()
    for name in sorted(GOLDEN_CONFIGS):
        scene = GOLDEN_CONFIGS[name].get("scene", name)
        path = os.path.join(tmp, f"{scene}.glb")
        if not os.path.exists(path):
            MAKERS[scene](path)
        image = render_golden(name, path)
        write_golden(name, image)
        print(f"wrote golden: {name} ({image.shape})")


if __name__ == "__main__":
    main()
