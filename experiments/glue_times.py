"""Direct timing of the non-traversal frame pieces at headline scale.

The 812 ms atrium frame splits ~47 primary + ~554 secondary traversal
+ ~210 "glue".  This times each glue candidate in isolation at 2.07M
lanes (min-over-reps, completion forced by scalar fetches):

  - bounce-sort pipeline: 6d key + argsort + o/d/active gather + the
    4-column inverse hit gather
  - full shading fetch + BRDF extension (bounce-0's work)
  - lean emissive fetch (last-bounce path)
  - sky/accumulate arithmetic

Run on TPU: python experiments/glue_times.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("VKPT_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["VKPT_PLATFORM"])
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/vkpt_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def bench(name, fn, reps=5):
    out = fn()
    _ = float(jax.tree_util.tree_leaves(out)[0].sum())
    best = 9e9
    for _i in range(reps):
        t0 = time.perf_counter()
        out = fn()
        _ = float(jax.tree_util.tree_leaves(out)[0].sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best * 1000:7.1f} ms", flush=True)
    return best


def main():
    from assets.procedural import make_atrium
    from vulkan_pathtracer_tpu.app.camera_path import orbit_path
    from vulkan_pathtracer_tpu.models import gltf
    from vulkan_pathtracer_tpu.models.camera import Camera
    from vulkan_pathtracer_tpu.models.device_scene import build_device_scene
    from vulkan_pathtracer_tpu.render.pipeline import _tile_order, generate_rays
    from vulkan_pathtracer_tpu.render import wavefront as wf
    from vulkan_pathtracer_tpu.render.shading import (
        get_emissive_lean, get_material_data, get_triangle_data,
    )
    from vulkan_pathtracer_tpu.ops.intersect import Hit

    W, H = 1920, 1080
    path = "/tmp/bench_atrium_4.1.glb"
    if not os.path.exists(path):
        make_atrium(path, detail=4.1)
    scene = gltf.load(path)
    dev = build_device_scene(scene, build_bvh=True, max_leaf_size=14)
    print(f"tris={dev.num_triangles}", flush=True)

    cam = Camera(aspect_ratio=W / H)
    orbit_path(radius=4.5, height=2.2, duration=4.0,
               center=(0.0, 1.2, 0.0)).apply(cam, 0.0)
    pos, hor, ver, fwd = (jnp.asarray(v) for v in cam.push_constants())
    o, d = generate_rays(pos, hor, ver, fwd, W, H)
    t_order, _ = _tile_order(H, W)
    o, d = o[jnp.asarray(t_order)], d[jnp.asarray(t_order)]
    o, d = jax.device_put(o), jax.device_put(d)
    n = o.shape[0]
    alive = jnp.ones((n,), bool)

    # A real primary hit set to shade / bounce from.
    @jax.jit
    def primary():
        return wf._closest_hit(dev, o, d, None, "auto", phase="primary")

    hit = primary()
    _ = float(hit.t.sum())
    bench("primary traversal (ref)", primary)

    @jax.jit
    def sort_pipeline(o, d, alive, hit):
        key = wf._bounce_sort_key(dev, o, d, alive)
        _, order = wf._state_sort_order(key, wf._sort_chunk())
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype))
        os_, ds_, as_ = o[order], d[order], alive[order]
        # stand-in for the traversal result: reuse hit fields
        back = Hit(t=hit.t[inv], tri=hit.tri[inv], u=hit.u[inv],
                   v=hit.v[inv])
        return os_, ds_, as_, back

    bench("sort pipeline (key+argsort+3 gathers+4 inv-gathers)",
          lambda: sort_pipeline(o, d, alive, hit))

    @jax.jit
    def key_only(o, d, alive):
        key = wf._bounce_sort_key(dev, o, d, alive)
        _, order = wf._state_sort_order(key, wf._sort_chunk())
        return order

    bench("key + argsort only", lambda: key_only(o, d, alive))

    @jax.jit
    def shade_extend(hit, o, d):
        sx = jnp.full((n,), jnp.uint32(123))
        sy = jnp.full((n,), jnp.uint32(456))
        atten = jnp.ones((n, 3), jnp.float32)
        color = jnp.zeros((n, 3), jnp.float32)
        return wf._shade_and_extend(dev, hit, o, d, atten, color, sx, sy,
                                    alive, last=False, rr=False)

    bench("full shade+extend (bounce-0 glue)",
          lambda: shade_extend(hit, o, d))

    @jax.jit
    def shade_last(hit, o, d):
        sx = jnp.full((n,), jnp.uint32(123))
        sy = jnp.full((n,), jnp.uint32(456))
        atten = jnp.ones((n, 3), jnp.float32)
        color = jnp.zeros((n, 3), jnp.float32)
        return wf._shade_and_extend(dev, hit, o, d, atten, color, sx, sy,
                                    alive, last=True, rr=False)

    bench("last-bounce shade (lean)", lambda: shade_last(hit, o, d))

    @jax.jit
    def full_fetch(hit):
        td = get_triangle_data(dev, hit)
        return get_material_data(dev, td).emissive

    bench("full tri+mat fetch alone", lambda: full_fetch(hit))


if __name__ == "__main__":
    main()
