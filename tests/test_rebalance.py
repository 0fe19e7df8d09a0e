"""Cross-chip ray-queue rebalancing (SURVEY §2 stretch item) on the
8-device virtual CPU mesh: the balanced all_to_all exchange must not
change any ray's result — sharded pooled rendering equals the
single-device pooled wavefront (up to XLA fma fusion)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vulkan_pathtracer_tpu.models import gltf
from vulkan_pathtracer_tpu.models.camera import Camera
from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
from vulkan_pathtracer_tpu.parallel.mesh import make_render_mesh
from vulkan_pathtracer_tpu.parallel.rebalance import (
    make_pooled_sharded_render,
)
from vulkan_pathtracer_tpu.parallel.sharding import replicate_scene
from vulkan_pathtracer_tpu.render.pipeline import generate_rays, _pixel_seeds
from vulkan_pathtracer_tpu.render.wavefront import trace_wavefront_pooled


@pytest.fixture(scope="module")
def cornell_dev(request):
    scene = gltf.load(request.getfixturevalue("cornell_glb"))
    return build_device_scene(scene, build_bvh=True)


def _pooled_inputs(dev, n_frames=2, W=64, H=32):
    """Pooled rays for n_frames cameras; M = n_frames*W*H = divisible
    by 64 (= 8 devices squared)."""
    os_, ds_, sxs, sys_ = [], [], [], []
    for k in range(n_frames):
        cam = Camera(aspect_ratio=W / H,
                     position=np.array([0.1 * k, 1.0, 2.5], np.float32))
        cam.set_orientation(yaw=180.0 + 3.0 * k, pitch=0.0)
        pos, hor, ver, fwd = (jnp.asarray(v) for v in
                              cam.push_constants())
        o, d = generate_rays(pos, hor, ver, fwd, W, H)
        sx, sy = _pixel_seeds(W, H, jnp.uint32(10 + k))
        os_.append(o)
        ds_.append(d)
        sxs.append(sx)
        sys_.append(sy)
    return (jnp.concatenate(os_), jnp.concatenate(ds_),
            jnp.concatenate(sxs), jnp.concatenate(sys_))


@pytest.mark.parametrize("rebalance", [True, False])
def test_sharded_pooled_matches_single(cornell_dev, rebalance):
    o, d, sx, sy = _pooled_inputs(cornell_dev)
    ref_color, ref_rays = trace_wavefront_pooled(
        cornell_dev, o, d, sx, sy, num_bounces=3, traversal="bvh",
        sort_secondary=True,
    )

    mesh = make_render_mesh(8)
    dev_r = replicate_scene(cornell_dev, mesh)
    fn = make_pooled_sharded_render(
        mesh, cornell_dev, num_bounces=3, traversal="bvh",
        sort_secondary=True, rebalance=rebalance,
    )
    color, rays = fn(dev_r, o, d, sx, sy)

    np.testing.assert_allclose(np.asarray(color), np.asarray(ref_color),
                               rtol=1e-5, atol=1e-6)
    assert float(rays) == pytest.approx(float(ref_rays))


def test_exchange_balances_alive_counts():
    """The strip exchange equalizes alive fractions: feed a wavefront
    where all alive rays sit on two devices' shards and check each
    device ends up with ~1/4 of them (keys put dead lanes last)."""
    from vulkan_pathtracer_tpu.parallel.mesh import TILE_AXIS
    from vulkan_pathtracer_tpu.parallel.rebalance import (
        _balanced_exchange,
    )
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_render_mesh(4)
    m_local = 64
    m = 4 * m_local

    # Alive (key 0..) only in the first two shards.
    alive = np.zeros((m,), bool)
    alive[: 2 * m_local] = True
    key = np.where(alive, np.arange(m, dtype=np.uint32),
                   np.uint32(0xFFFFFFFF))
    state = np.zeros((m, 16), np.float32)
    state[:, 14] = alive.astype(np.float32)

    def body(st, k):
        out = _balanced_exchange(st, k, 4)
        return jnp.sum(out[:, 14])[None]

    counts = np.asarray(shard_map(
        body, mesh=mesh, in_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        out_specs=P(TILE_AXIS), check_vma=False,
    )(jnp.asarray(state), jnp.asarray(key)))
    assert counts.shape == (4,)
    assert counts.sum() == 2 * m_local
    assert counts.max() - counts.min() <= m_local // 4


def test_exchange_balances_partially_alive_shards():
    """Every shard 50% alive must stay ~50% alive per chip after the
    exchange.  Contiguous quantile strips anti-balance this case
    (alive rays sort first, so chips 0..d/2-1 would come out fully
    alive and the rest fully dead); the round-robin strided deal keeps
    each strip a sample of the whole sorted shard."""
    from vulkan_pathtracer_tpu.parallel.mesh import TILE_AXIS
    from vulkan_pathtracer_tpu.parallel.rebalance import (
        _balanced_exchange,
    )
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_render_mesh(4)
    m_local = 64
    m = 4 * m_local

    # Every shard: first half alive, second half dead.
    alive = (np.arange(m) % m_local) < (m_local // 2)
    key = np.where(alive, np.arange(m, dtype=np.uint32),
                   np.uint32(0xFFFFFFFF))
    state = np.zeros((m, 16), np.float32)
    state[:, 14] = alive.astype(np.float32)

    def body(st, k):
        out = _balanced_exchange(st, k, 4)
        return jnp.sum(out[:, 14])[None]

    counts = np.asarray(shard_map(
        body, mesh=mesh, in_specs=(P(TILE_AXIS), P(TILE_AXIS)),
        out_specs=P(TILE_AXIS), check_vma=False,
    )(jnp.asarray(state), jnp.asarray(key)))
    assert counts.sum() == 2 * m_local
    # Each chip should hold ~m_local/2 alive rays (exact here: the
    # per-chip alive count is divisible by n_dev).
    assert counts.max() - counts.min() <= 4
