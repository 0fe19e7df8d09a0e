"""RGBA8 factor packing parity (Scene.zig:457-475 / GLSL unpackUnorm4x8)."""

import numpy as np
import jax.numpy as jnp

from vulkan_pathtracer_tpu.ops.packing import (
    pack_unorm4x8,
    unpack_unorm4x8,
    unpack_unorm4x8_np,
)


def test_pack_truncates_like_zig_intfromfloat():
    # @intFromFloat truncates: 0.999*255 = 254.745 -> 254.
    w = pack_unorm4x8(0.999, 0.5, 1.0, 0.0)
    assert (w & 0xFF) == 254
    assert ((w >> 8) & 0xFF) == 127  # 0.5*255 = 127.5 -> 127
    assert ((w >> 16) & 0xFF) == 255
    assert ((w >> 24) & 0xFF) == 0


def test_roundtrip():
    word = pack_unorm4x8(0.25, 0.5, 0.75, 1.0)
    x, y, z, w = unpack_unorm4x8(jnp.array([word], dtype=jnp.uint32))
    np_vals = unpack_unorm4x8_np(word)
    got = np.array([x[0], y[0], z[0], w[0]])
    np.testing.assert_allclose(got, np_vals, rtol=1e-7)
    # byte/255 exactly
    assert np.float32(x[0]) == np.float32(int(0.25 * 255) / 255.0)


def test_component_order_is_rgba_low_to_high():
    word = pack_unorm4x8(1.0, 0.0, 0.0, 0.0)
    x, y, z, w = unpack_unorm4x8(jnp.array([word], dtype=jnp.uint32))
    assert float(x[0]) == 1.0 and float(y[0]) == 0.0
