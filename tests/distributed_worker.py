"""Worker process for tests/test_distributed_real.py: joins a REAL
jax.distributed process group (TCP coordination service) on the CPU
backend and runs a cross-process psum over the global mesh.

    python tests/distributed_worker.py <port> <process_id> <nprocs>

Prints "DIST-OK <pid> <psum> <primary>" on success; any assertion
failure exits non-zero.
"""

import os
import sys

port, pid, n = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from vulkan_pathtracer_tpu.parallel import distributed  # noqa: E402

ok = distributed.initialize(f"127.0.0.1:{port}", n, pid)
assert ok, "initialize() returned False for a multi-process config"
assert jax.process_count() == n, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * n, len(jax.devices())

mesh = distributed.global_mesh()
sharding = NamedSharding(mesh, P("tiles"))
g = 4 * n


def cb(index):
    lo = index[0].start or 0
    hi = index[0].stop if index[0].stop is not None else g
    return np.arange(lo, hi, dtype=np.float32)


arr = jax.make_array_from_callback((g,), sharding, cb)

from jax.experimental.shard_map import shard_map  # noqa: E402

f = jax.jit(shard_map(
    lambda x: jax.lax.psum(x, "tiles"),
    mesh=mesh, in_specs=P("tiles"), out_specs=P(),
))
out = f(arr)
val = float(np.asarray(out.addressable_shards[0].data)[0])
expect = float(sum(range(g)))
assert val == expect, (val, expect)

# Production path across the REAL process group: the sharded tile
# render (framebuffer rows split over the global mesh — each process
# renders its own rows; the scene is replicated by device_put, which
# is valid multi-process because the bake is byte-identical on every
# process).
import tempfile  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from assets.procedural import make_box  # noqa: E402
from vulkan_pathtracer_tpu.models import gltf  # noqa: E402
from vulkan_pathtracer_tpu.models.camera import Camera  # noqa: E402
from vulkan_pathtracer_tpu.models.device_scene import (  # noqa: E402
    build_device_scene,
)
from vulkan_pathtracer_tpu.parallel.sharding import (  # noqa: E402
    make_sharded_render,
    replicate_scene,
)

glb = os.path.join(tempfile.gettempdir(), "dist_box.glb")
if not os.path.exists(glb):
    make_box(glb + f".{pid}")
    os.replace(glb + f".{pid}", glb)
dev = build_device_scene(gltf.load(glb), build_bvh=True)
dev = replicate_scene(dev, mesh)
cam = Camera(aspect_ratio=1.0,
             position=np.array([0, 0, -3], np.float32))
pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
height = 2 * g  # 2 rows per device
render = make_sharded_render(
    mesh, dev, num_samples=1, num_bounces=2,
    width=8, height=height, traversal="bvh", mode="tiles",
)
img, rays = render(dev, pos, hor, ver, fwd, jnp.uint32(0))
local_rows = np.concatenate(
    [np.asarray(s.data) for s in img.addressable_shards], axis=0)
assert local_rows.shape == (height // n, 8, 3), local_rows.shape
assert np.isfinite(local_rows).all()
assert float(local_rows.sum()) > 0.0
print(f"DIST-OK {jax.process_index()} {val} {distributed.is_primary()}",
      flush=True)
