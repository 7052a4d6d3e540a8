#!/usr/bin/env python
"""Virtual-device scaling curve: fixed total work, tile-parallel render over
1/2/4/8 devices on the forced-CPU mesh (the same shard_map programs a real
slice runs over ICI). Writes SCALING.md with measured efficiencies —
replacing the hard-coded-input unit test the round-2 review flagged.

Run: python tools/scaling_curve.py  (forces JAX_PLATFORMS=cpu, 8 devices)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)



def main():
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.parallel import (make_mesh, render_batch_sharded,
                                        replicate_scene)
    from solstrale_tpu.parallel.distributed import scaling_efficiency
    from solstrale_tpu.scene.compile import compile_scene

    w, h, spp, depth = 200, 100, 4, 10
    cfg = RenderConfig(width=w, height=h, samples_per_pixel=spp, seed=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)

    rows = []
    base_rate = None
    for n_tile in (1, 2, 4, 8):
        mesh = make_mesh(n_tile=n_tile, n_sample=1,
                         devices=jax.devices()[:n_tile])
        cs_r = replicate_scene(cs, mesh)

        def run():
            color, segs = render_batch_sharded(
                cs_r, 1, spp, 1, mesh, width=w, height=h, max_depth=depth)
            return color.block_until_ready(), float(segs)

        run()  # compile + warmup
        t0 = time.perf_counter()
        _, segs = run()
        dt = time.perf_counter() - t0
        rate = segs / dt / 1e6
        if base_rate is None:
            base_rate = rate
        eff = scaling_efficiency({1: base_rate, n_tile: rate})[n_tile]
        rows.append((n_tile, dt, segs, rate, eff))
        print(f"n_tile={n_tile}: {dt*1e3:8.1f} ms  segs={segs:.0f}  "
              f"{rate:6.2f} Mrays/s  efficiency={eff*100:5.1f}%", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.md")
    with open(out, "w") as f:
        f.write(
            "# Tile-parallel scaling (virtual 8-device CPU mesh)\n\n"
            "Fixed total work — the kitchen-sink scene at "
            f"{w}x{h} @ {spp} spp, depth {depth} — rendered through\n"
            "`parallel.render_batch_sharded` (work-queue wavefront per tile "
            "shard, psum over\nthe mesh; the exact shard_map program a TPU "
            "slice runs over ICI). Measured on\nthe forced-CPU backend: "
            "virtual devices share host cores, so these numbers\nexercise "
            "the sharding machinery and LOAD BALANCE, not chip-count "
            "speedup —\nefficiency here is bounded by the 2 physical host "
            "cores. On a real slice each\nmesh device is a chip; the "
            "BASELINE.md north star is >=85% at 1->4 hosts.\n\n"
            "| n_tile | wall ms | segments | Mrays/s | efficiency vs 1 |\n"
            "|---|---|---|---|---|\n")
        for n_tile, dt, segs, rate, eff in rows:
            f.write(f"| {n_tile} | {dt*1e3:.1f} | {segs:.0f} | {rate:.2f} "
                    f"| {eff*100:.1f}% |\n")
        f.write("\nThe per-shard segment totals are exact (padded duplicate "
                "lanes are excluded\nvia trace_queued's n_valid), so rays/s "
                "is comparable across shardings; the\nrendered image is "
                "bit-identical for every n_tile (counter-based RNG keyed "
                "on\npixel id — verified by tests/test_sharding.py).\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
