"""Benchmark: p50 per-click forward_mask latency on a ScanNet-scale scene.

The driver-set north star (BASELINE.json) is <50 ms p50 per-click inference
with cached backbone features on one TPU chip. Prints ONE JSON line
{"metric", "value", "unit", "vs_baseline"} where vs_baseline = 50 / p50_ms
(>1 means faster than the target).

Timing methodology (see PERF.md "tunnel quirks"):

- On the axon tunnel, ``block_until_ready`` returns at dispatch, so each
  timing loop runs INSIDE one jitted program (``fori_loop`` with a
  denormal-scale data dependency between iterations) and the run is fenced
  with a single scalar readback — the loop cannot overlap or skip work.
- The axon remote compile service NONDETERMINISTICALLY emits 10-80x slower
  binaries for identical programs (PERF.md, round 2). Every timed program
  is therefore compiled >= 2 INDEPENDENT times (a draw-indexed denormal
  constant baked into the traced graph gives each draw a fresh cache key
  and hence a fresh binary), and the reported number is the MIN over
  draws. Drawing continues (up to 4) until two draws agree within 15%
  of the min, so a double-bad-draw coin flip cannot poison the
  scoreboard.
- Draw cache keys are unique per run: the persistent compilation cache
  (enabled for the untimed setup programs) must never replay a previous
  run's binaries into the timed draws, because a bad-binary draw recorded
  once would then repeat forever and min-over-draws could not recover.
  Reproducibility comes from draw agreement, not from cache hits.

Also reports (to stderr) backbone latency for context.
"""

import json
import os
import sys
import time

import numpy as np

MAX_DRAWS = 5
AGREE_RATIO = 1.15  # stop once >=2 draws sit within 15% of the min
# Shifts every draw's cache key. Default: unique per RUN (time-based), so
# every timed draw is a genuinely fresh compile. A stable salt (e.g. git
# HEAD) was tried and is a trap: the persistent compilation cache then
# replays whatever binaries the FIRST run at that salt happened to draw —
# measured here serving a 3052 ms backbone (bad draw recorded under a
# degraded process) for every subsequent bench at the same commit, which
# defeats min-over-draws entirely (all "draws" hit the same bad cache
# entries). Fresh compiles cost wall-clock (~1-4 min/program) but the
# scoreboard number they produce is a property of the code, not of cache
# history. Set AGILE3D_BENCH_SALT to pin a salt when reproducing a
# specific draw is the point. Kept < 9973 so every (salt, draw) maps to a
# distinct float32 eps constant (spacing 1e-40 > the f32 ulp at 1.6e-35).
SALT = int(os.environ.get("AGILE3D_BENCH_SALT",
                          str(int(time.time()) % 9973)))


def fence(x):
    """Force completion of x's producer with a 4-byte readback."""
    import jax

    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(leaf.reshape(-1)[0].astype("float32"))


def min_over_draws(make_timed, label):
    """Compile-and-time independent draws of a program; return min ms.

    ``make_timed(draw)`` must return a zero-arg callable that runs the
    (freshly traced, draw-keyed) timing loop once and returns per-call ms.
    The first call of each draw pays compile; steady-state is measured on
    subsequent calls.
    """
    per_draw = []
    draw = 0
    while True:
        timed = make_timed(draw)
        t0 = time.time()
        timed()  # compile + first
        compile_s = time.time() - t0
        reps = [timed() for _ in range(3)]
        steady = float(np.median(reps))
        per_draw.append(steady)
        print(f"{label} draw {draw}: compile+first {compile_s:.1f}s, "
              f"steady {steady:.2f} ms (reps {[f'{r:.2f}' for r in reps]})",
              file=sys.stderr)
        draw += 1
        if draw >= MAX_DRAWS:
            break
        if draw >= 2:
            lo = min(per_draw)
            near_min = sum(1 for v in per_draw if v <= lo * AGREE_RATIO)
            if near_min >= 2:
                break
    best = min(per_draw)
    print(f"{label}: min over {draw} draws = {best:.2f} ms", file=sys.stderr)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from agile3d_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from agile3d_tpu.config import Config
    from agile3d_tpu.engine.eval import InteractiveEngine
    from agile3d_tpu.engine.clicks import HostClicks, NewClicks
    from agile3d_tpu.models.agile3d import init_agile3d
    from agile3d_tpu.data.datasets import SceneSample, collate_scenes
    from agile3d_tpu.sparse.quantize import sparse_quantize
    from tests.synthetic import make_scene

    cfg = Config()
    rng = np.random.default_rng(0)

    # ~100k voxels: the upper end of ScanNet at 5 cm (reference
    # res16unet.py:224 shape trace)
    coords, colors, labels = make_scene(rng, n_points=400000, num_obj=8,
                                        extent=8.0)
    coords += rng.standard_normal(coords.shape).astype(np.float32) * 0.03
    vox, umap, imap = sparse_quantize(coords, cfg.model.voxel_size)
    sample = SceneSample(
        vox_coords=vox, raw_coords=coords[umap],
        feats=colors[umap].astype(np.float32) / 255.0,
        labels=labels[umap].astype(np.int32),
        labels_full=labels.astype(np.int32), inverse_map=imap,
        click_idx={}, scene_name="bench", num_obj=8)
    n_valid = len(vox)
    print(f"bench scene: {n_valid} voxels", file=sys.stderr)

    params, buffers, bn_state = init_agile3d(jax.random.PRNGKey(0), cfg.model)
    engine = InteractiveEngine(cfg)
    batch = collate_scenes([sample], cfg.buckets)

    from agile3d_tpu.models.agile3d import forward_backbone

    pyr, feats_dev, raw_dev, si_dev = engine.device_batch(batch)

    def make_backbone_timed(draw):
        # Draw-indexed denormal constant: changes the traced HLO so each
        # draw gets its own cache key => its own independent compile.
        # Timed per call with a fence rather than an in-graph fori_loop:
        # the Mosaic banded-conv kernels run ~5x slower inside a while
        # loop (and giant loop programs also overflow the axon remote-
        # compile relay — stress_kitti precedent); the fence costs ~2 ms,
        # noise at backbone scale.
        eps = 1e-38 + (draw + 16 * SALT) * 1e-40

        @jax.jit
        def backbone_once(params, buffers, bn_state, feats, raw, si):
            scene, _ = forward_backbone(params, buffers, bn_state, pyr,
                                        feats, raw, si, training=False,
                                        cfg=cfg.model)
            # full reduction: no element of the forward is dead code
            return jnp.sum(scene.mask_feat.astype(jnp.float32)) * eps

        def timed():
            t0 = time.time()
            fence(backbone_once(params, buffers, bn_state, feats_dev,
                                raw_dev, si_dev))
            return 1000 * (time.time() - t0)

        return timed

    bb_ms = min_over_draws(make_backbone_timed, "backbone")
    scene, _ = engine._backbone(params, buffers, bn_state, pyr, feats_dev,
                                raw_dev, si_dev, training=False)

    # clicks: a realistic mid-session state (24 clicks over 8 objects)
    clicks = HostClicks(cfg.model.max_clicks)
    cl_vox = rng.integers(0, n_valid, 24).astype(np.int32)
    cl_obj = np.tile(np.arange(8, dtype=np.int32) + 1, 3)[:24]
    clicks.extend(NewClicks(cl_vox, cl_obj, np.arange(24, dtype=np.int32)))

    from agile3d_tpu.models.agile3d import ClickState, forward_mask

    cs = ClickState(vox=jnp.asarray(clicks.vox[None]),
                    obj=jnp.asarray(clicks.obj[None]),
                    time=jnp.asarray(clicks.time[None]))
    num_obj_dev = jnp.asarray([8], jnp.int32)

    mc = engine._click_bucket(clicks.count)
    cs_b = ClickState(vox=cs.vox[:, :mc], obj=cs.obj[:, :mc],
                      time=cs.time[:, :mc])
    FM_ITERS = 20

    def make_mask_timed(draw):
        eps = 1e-38 + (draw + 16 * SALT) * 1e-40

        @jax.jit
        def loop(params, buffers, scene, cs, num_obj):
            def body(_, feat):
                sc = scene._replace(mask_feat=feat)
                out = forward_mask(params, buffers, sc, cs, num_obj,
                                   cfg=cfg.model)
                pred = jnp.argmax(out["pred_masks"], -1)
                return feat + pred[..., :1].astype(jnp.float32) * eps

            return jax.lax.fori_loop(0, FM_ITERS, body, scene.mask_feat)

        def timed():
            t0 = time.time()
            fence(loop(params, buffers, scene, cs_b, num_obj_dev))
            return 1000 * (time.time() - t0) / FM_ITERS

        return timed

    p50 = min_over_draws(make_mask_timed, "forward_mask")
    print(f"forward_mask per-call (in-graph x{FM_ITERS}, min over "
          f"independent compiles): {p50:.2f} ms; backbone {bb_ms:.1f} ms",
          file=sys.stderr)

    print(json.dumps({
        "metric": "per_click_forward_mask_p50_latency",
        "value": round(p50, 3),
        "unit": "ms",
        "vs_baseline": round(50.0 / p50, 2),
    }))


if __name__ == "__main__":
    main()
