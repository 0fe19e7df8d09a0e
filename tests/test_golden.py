"""Golden-image regression tests (SURVEY.md §4 plan).

Goldens live in tests/goldens/ and were rendered by this repo on the
CPU backend; regenerate with:
    python tests/regen_goldens.py
"""

import os

import pytest

from tests.golden_utils import (
    GOLDEN_CONFIGS,
    compare_to_golden,
    golden_path,
    render_golden,
)

_FIXTURE = {"box": "box_glb", "cornell": "cornell_glb",
            "sphere": "sphere_glb", "textured": "sphere_glb"}


@pytest.mark.parametrize("name", sorted(GOLDEN_CONFIGS))
def test_golden(name, request):
    if not os.path.exists(golden_path(name)):
        pytest.skip(f"golden {name} not generated yet")
    scene_path = request.getfixturevalue(_FIXTURE[name])
    image = render_golden(name, scene_path)
    compare_to_golden(name, image)
