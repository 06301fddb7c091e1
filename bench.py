"""Benchmark: registered frames/s/chip on the flagship SLAM configuration.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
Baseline target (BASELINE.md): ≥500 registered frames/s/chip at
reference-level ATE on a 640×480 sequence.  The workload is a synthetic
square-loop ground-texture sequence (no external data in the image), run
through the full jitted pipeline — undistort, KCC tracking, keyframe
decisions, spatially-gated batched loop closure, pose-graph trigger — via
the on-device ``lax.scan`` driver; ATE RMSE against ground truth is
reported alongside to certify the frames are genuinely registered.

Usage: python bench.py [--quick] [--frames N] [--chunk N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small config (CPU smoke)")
    ap.add_argument(
        "--full", action="store_true",
        help="(default since r4) 640x480 / polar 720x480 flagship config — "
        "the reference's own problem size (config_ntu.yaml). Kept as a "
        "no-op flag for compatibility",
    )
    ap.add_argument(
        "--small", action="store_true",
        help="256x256 / polar 360x64 config (r2/r3's official size; kept "
        "for trend comparison)",
    )
    ap.add_argument("--frames", type=int, default=0)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument(
        "--batch", type=int, default=0,
        help="also measure data-parallel multi-sequence throughput at this "
        "batch size (BASELINE config 4)",
    )
    ap.add_argument(
        "--size", type=int, nargs=2, default=None, metavar=("H", "W"),
        help="override the image size (exploration datapoints, e.g. the "
        "reference's 448x448 geekplus or 1200x1600 HD configs); the "
        "OFFICIAL number is the frozen default size",
    )
    ap.add_argument(
        "--polar", type=int, nargs=2, default=None, metavar=("D", "C"),
        help="override (rotation_divisor, rotation_channel) — the polar "
        "resample is the measured hot spot and the reference's own tuning "
        "notes say channel counts as low as 64 work "
        "(/root/reference/configs/config_geekplus.yaml:10); ATE gates it",
    )
    ap.add_argument(
        "--scaling", type=int, default=-1, metavar="N",
        help="emit scaling evidence from an N-device virtual CPU mesh: "
        "exact per-shard work stats, collective bytes parsed from the "
        "compiled HLO, and a [0,1]-clamped 1-vs-N partition-overhead "
        "bound (scaling_* keys in the JSON; see utils/scaling.py). 0 "
        "disables; default auto-sizes to the host core count rounded "
        "down to a power of two (the shard count must divide the bank/"
        "edge capacities, and more shards than cores would measure "
        "timeslicing, not partitioning overhead)",
    )
    args = ap.parse_args()
    if args.scaling < 0:
        # Largest power of two <= min(8, cores): always divides the
        # 256-slot bank and 512-edge capacities used below.
        cores = max(2, min(8, os.cpu_count() or 2))
        args.scaling = 1 << (cores.bit_length() - 1)

    if args.scaling:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.scaling}"
            ).strip()

    import jax

    # Honor JAX_PLATFORMS=cpu even when a sitecustomize hook force-registers
    # an accelerator backend (config.update wins over the preset).
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    # Persistent compilation cache: the scan program is large and some
    # backends compile it remotely (minutes); cache hits make reruns fast.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp

    from nislam_tpu.core.config import (
        CFConfig,
        CameraConfig,
        KeyframeSelectionConfig,
        LoopClosureConfig,
        MapConfig,
        SlamConfig,
        derive_response_thresholds,
    )
    from nislam_tpu.core.slam import make_engine
    from nislam_tpu.io.trajectory import ate_rmse
    from nislam_tpu.utils.synthetic import (
        add_sensor_noise,
        heading_loop_path,
        make_world,
        render_sequence,
    )

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}", file=sys.stderr)

    # Motion scaled to TUM-like keyframe spacing (one keyframe every ~10
    # frames at 30 Hz — cf. the reference's max_distance 0.4 m defaults).
    if args.quick:
        h, w, rd, rc = 120, 160, 180, 96
        n_frames = args.frames or 128
        world_n, step_px = 1024, 3.0
        chunk = min(args.chunk, 64)
    elif args.small:
        # r2/r3's official size, kept for the cross-round trend line.
        h, w, rd, rc = 256, 256, 360, 64
        n_frames = args.frames or 256
        world_n, step_px = 2048, 4.0
        chunk = min(args.chunk, 64)
    else:
        # OFFICIAL (frozen as of r4, VERDICT r3 #2): the reference's own
        # flagship problem size — 640×480 image, 720×480 polar grid
        # (/root/reference/configs/config_ntu.yaml:6-13), full default
        # memory config (filter cache ON, bf16 bank storage).
        h, w, rd, rc = 480, 640, 720, 480
        n_frames = args.frames or 512
        world_n, step_px = 4096, 8.0
        chunk = args.chunk
    if args.size:
        h, w = args.size
    if args.polar:
        rd, rc = args.polar

    fx = float(w)
    px = 1.0 / fx  # metric pixel size (height 1 m)
    # PSR thresholds derived from the reference's 640×480 anchors by the
    # measured sqrt-area law (scripts/psrcal.py; VERDICT r2 #4) — not
    # hand-picked for the synthetic world.
    thr = derive_response_thresholds(w, h, rd, rc)
    config = SlamConfig(
        cf=CFConfig(width=w, height=h, rotation_divisor=rd, rotation_channel=rc),
        keyframe_selection=KeyframeSelectionConfig(
            max_distance=10.0 * step_px * px,
            max_angle=0.05236,
            lower_response_thr=thr["lower_response_thr"],
            upper_response_thr=thr["upper_response_thr"],
            lower_rotation_response_thr=thr["lower_rotation_response_thr"],
            upper_rotation_response_thr=thr["upper_rotation_response_thr"],
        ),
        map=MapConfig(
            grid_scale=0.3 * h * px,
            keyframe_capacity=max(256, n_frames // 2 + 16),
            edge_capacity=2 * n_frames,
            store_images=False,
            # Filter cache ON at every size (r3's 640×480 carve-out is
            # gone): bf16 bank storage halves the spectra+filter HBM, so
            # the full flagship bank fits this chip with the cache
            # (MapConfig.bank_dtype; decision-parity tested in
            # tests/test_slam_engine.py::test_bank_dtype_bf16_matches_f32).
            cache_filters=True,
            bank_dtype="bf16",
        ),
        loop_closure=LoopClosureConfig(
            # NISLAM_BENCH_NO_LOOP=1: perf-ablation knob (loop search off).
            to_find_loop=os.environ.get("NISLAM_BENCH_NO_LOOP", "") in ("", "0"),
            position_response_thr=thr["position_response_thr"],
            angle_response_thr=thr["angle_response_thr"],
            frame_gap_thr=30,
            distance_thr=16 * step_px * px,
            max_candidates=int(os.environ.get("NISLAM_BENCH_MAX_CAND", "8")),
            # Coarse-to-fine candidate ranking (LoopClosureConfig.coarse_scale);
            # 1 = exact full-res ranking (the frozen flagship semantics).
            coarse_scale=int(os.environ.get("NISLAM_BENCH_COARSE", "1")),
        ),
        camera=CameraConfig(
            image_width=w, image_height=h, height=1.0,
            intrinsics=(fx, w / 2.0, fx, h / 2.0),
        ),
        # Divides the per-while-iteration carry overhead of this tunneled
        # backend (scripts/bwprobe3.py); compile time scales with it.
        scan_unroll=int(os.environ.get("NISLAM_BENCH_UNROLL", "1")),
    )

    # Rotating loop (heading tangent to motion, 360° of yaw) + sensor noise
    # and illumination drift: the workload exercises the rotation-recovery
    # branch end-to-end, so the reported ATE gates real tracking (VERDICT r1).
    t0 = time.time()
    world = make_world(world_n, 3.0)
    poses = heading_loop_path(
        n_frames, step=step_px, start=(world_n / 2.0, world_n / 2.0)
    )
    frames = add_sensor_noise(render_sequence(world, h, w, poses))
    gt = np.array([(p[0] - world_n / 2.0, p[1] - world_n / 2.0) for p in poses]) * px
    print(f"data gen: {time.time() - t0:.1f}s ({n_frames} frames {h}x{w})", file=sys.stderr)

    engine = make_engine(config)
    n_use = (n_frames // chunk) * chunk

    n_chunks = n_frames // chunk
    frames_j = jnp.asarray(frames[:n_use]).reshape(n_chunks, chunk, h, w)

    # Warmup: compile + one chunk (and the deferred-optimize program the
    # timed loop invokes per chunk).  Sync via a host transfer — on
    # tunneled backends block_until_ready can return before remote
    # execution finishes; a d2h readback is the only honest fence.
    t0 = time.time()
    state = engine.init_state()
    state, _ = engine.run_chunk(state, frames_j[0])
    state, _ = engine.optimize(state)
    int(np.asarray(state.bank.count))
    print(f"compile+first chunk: {time.time() - t0:.1f}s", file=sys.stderr)

    # Timed run over the whole sequence, fresh state.
    state = engine.init_state()
    outs_all = []
    t0 = time.time()
    for i in range(n_chunks):
        state, outs = engine.run_chunk(state, frames_j[i])
        # The deferred CheckAndOptimize trigger between chunks — the same
        # mid-run solve cadence the CLI pays (its lax.cond body only
        # executes with ≥2 pending matches); part of the honest per-frame
        # cost, not just finalize-time work.
        state, _ = engine.optimize(state)
        outs_all.append(outs)
    # Fence: the final pose depends on every frame of every chunk.
    np.asarray(outs_all[-1].pose)
    dt = time.time() - t0
    fps = n_use / dt
    outs = jax.tree.map(
        lambda *xs: np.concatenate([np.asarray(x) for x in xs]), *outs_all
    )
    state, _ = engine.finalize(state)
    tracked = int(outs.tracked.sum())
    n_kf = int(state.bank.count)
    times = np.arange(len(outs.pose)) / 30.0
    try:
        ate = ate_rmse(times, outs.pose[:, :2], times, gt[: len(outs.pose)])
    except ValueError:
        ate = float("nan")
    print(
        f"{n_use} frames in {dt:.2f}s | tracked {tracked} | "
        f"keyframes {n_kf} | loops {int(outs.loop_found.sum())} | ate {ate:.4f} m",
        file=sys.stderr,
    )

    result = {
        "metric": "registered_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 3),
        "ate_rmse_m": round(ate, 4) if ate == ate else None,
        "tracked_frac": round(tracked / n_use, 3),
        "device": f"{dev.platform}:{dev.device_kind}",
        "image": f"{h}x{w}",
        "polar": f"{rd}x{rc}",
        "semantics": "exact_per_frame",  # r3: block/lookahead mode removed
        # frames whose loop search saw more eligible candidates than
        # max_candidates (0 = no silent truncation; VERDICT r3 weak #3)
        "loop_truncated_frames": int(
            (outs.loop_eligible > config.loop_closure.max_candidates).sum()
        ),
    }

    if args.batch:
        # Data-parallel multi-sequence throughput: B sequences tracked in
        # one vmapped program on the same chip (BASELINE config 4).  The
        # front end is embarrassingly parallel, so the small-tensor latency
        # floor amortizes across the batch.
        from nislam_tpu.parallel.batch import make_batch_engine

        b = args.batch
        beng = make_batch_engine(config, batch=b)
        per_seq = max(1, min(chunk, n_frames // 4))
        imgs = jnp.asarray(
            np.broadcast_to(frames[:per_seq], (b, per_seq, h, w)).copy()
        )
        states = beng.init_states()
        states, bouts = beng.run_chunk(states, imgs)
        np.asarray(bouts.pose)  # warm + fence
        states = beng.init_states()
        t0 = time.time()
        states, bouts = beng.run_chunk(states, imgs)
        np.asarray(bouts.pose)
        bdt = time.time() - t0
        result["batch_size"] = b
        result["batch_frames_per_sec_per_chip"] = round(b * per_seq / bdt, 1)

    if args.scaling:
        # Scaling evidence on an N-virtual-device CPU mesh (VERDICT r2 #5:
        # the evidence must be unable to exceed its own ideal).  Virtual
        # devices share host cores, so wall-clock ratios cannot demonstrate
        # a hardware speedup; what transfers to a real pod is reported
        # instead:
        #   (a) per-shard work of the sharded loop search — static shapes
        #       make the balance exact: every shard scans capacity/N slots
        #       and registers min(max_candidates, capacity/N) candidates,
        #   (b) collective traffic per operation, read from the compiled
        #       HLO of the sharded loop search and the distributed GN-CG
        #       solve (bytes moved over the mesh axis per invocation),
        #   (c) the 1-vs-N-mesh time ratio ONLY as a sanity bound, min/max
        #       over >=5 repeats, clamped to [0, 1] by construction.
        from nislam_tpu.parallel.mesh import make_mesh
        from nislam_tpu.utils.scaling import (
            collective_bytes_loop_search,
            collective_bytes_solver,
            partition_overhead_bound,
            shard_work_stats,
        )

        # Never let the evidence stage kill the benchmark JSON: any failure
        # (explicit --scaling not dividing the capacities, an exotic host)
        # is reported in-band instead.
        try:
            ns = args.scaling
            cpus = jax.devices("cpu")
            assert len(cpus) >= ns, f"only {len(cpus)} virtual CPU devices"
            mesh = make_mesh({"bank": ns}, devices=cpus[:ns])
            work = shard_work_stats(keyframe_capacity=256, nshards=ns,
                                    max_candidates=config.loop_closure.max_candidates)
            cb_loop = collective_bytes_loop_search(mesh, config)
            cb_solve = collective_bytes_solver(mesh, keyframe_capacity=256,
                                               edge_capacity=512)
            eff_lo, eff_hi = partition_overhead_bound(
                cpus, ns, frames, repeats=5
            )
            result["scaling_devices"] = ns
            result["scaling_slots_per_shard"] = work["slots_per_shard"]
            result["scaling_registrations_per_shard"] = work["registrations_per_shard"]
            result["scaling_work_balance"] = work["balance"]  # 1.0 = exact
            result["scaling_collective_bytes_loop_search"] = cb_loop
            result["scaling_collective_bytes_per_solve"] = cb_solve
            result["scaling_efficiency_bound"] = [eff_lo, eff_hi]  # clamped <=1
        except Exception as e:  # pragma: no cover - host-dependent
            result["scaling_error"] = f"{type(e).__name__}: {e}"
            print(f"scaling evidence failed: {e}", file=sys.stderr)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
