"""Benchmark CLI — parameterized version of the repo-root ``bench.py``.

Reference protocol (``src/benchmark.py:36-53``): warmup then timed
full-pipeline iterations, print FPS. Extensions: batch size, input format
(gray/bgr), optional pose solve included, per-stage timing breakdown.
"""

from __future__ import annotations

import argparse
import time


def build_argparser():
    p = argparse.ArgumentParser(description="DeepCharuco TPU benchmark")
    p.add_argument("--config", default=None)
    p.add_argument("--deepc", default=None)
    p.add_argument("--refinenet", default=None)
    p.add_argument("--batch", type=int, default=256)
    p.add_argument("--iters", type=int, default=40)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--input", choices=["gray", "bgr"], default="gray")
    p.add_argument("--with-pose", action="store_true",
                   help="include the batched PnP solve in the program")
    p.add_argument("--image", default=None, help="benchmark frame (else board render)")
    p.add_argument("--breakdown", action="store_true",
                   help="also time detector-only and two-stage separately")
    p.add_argument("--multi-stream", type=int, default=0,
                   help="serve N independent video streams through "
                        "serving.StreamServer (BASELINE config #5 protocol "
                        "at the configured resolution — use "
                        "--config with input_size 640x480 or --size 640x480) "
                        "and report aggregate fps + per-step latency")
    p.add_argument("--size", default=None,
                   help="override input resolution WxH (e.g. 640x480)")
    p.add_argument("--frames-per-stream", type=int, default=64)
    p.add_argument("--stream-chunk", type=int, default=0,
                   help="with --multi-stream: serve via DeviceQueueServer, "
                        "uploading N steps per stream as one device-resident "
                        "block and dispatching once per chunk (amortizes the "
                        "tunnel RTT; adds N frame-intervals of latency). "
                        "0 = per-step StreamServer")
    p.add_argument("--hires", nargs="?", type=int, const=2, default=0,
                   choices=[2, 4], metavar="SCALE",
                   help="hi-res patch tap: frames at SCALE× the config "
                        "resolution (bare flag = 2), detector on the pooled "
                        "view, RefineNet on full-res patches "
                        "(two_stage_forward_hires) — the product-realistic "
                        "native-camera-input path")
    p.add_argument("--depth", type=int, default=2,
                   help="in-flight dispatch window while fetching results "
                        "(2 = the official bench.py protocol, overlapping "
                        "the fetch round trip with compute; 1 = serialize "
                        "one fetch RTT per iteration)")
    p.add_argument("--fetch", choices=["all", "refined"], default="all",
                   help="per-iteration completion fetch: every output leaf "
                        "(default; what a consumer downloading the full "
                        "result set pays) or the refined-corners array only "
                        "(= bench.py's exact protocol; the knob matters "
                        "only when tunnel bandwidth is degraded — "
                        "BENCH_NOTES 'Round-4 harness reconciliation')")
    p.add_argument("--rn-patch-size", type=int, choices=[24, 32], default=24,
                   help="RefineNet patch size (match the checkpoint)")
    p.add_argument("--geom-decode", action="store_true",
                   help="time the geometry-consistent decode "
                        "(ops/geom.py homography reselection) instead of "
                        "the parity decode")
    p.add_argument("--geom-ransac", type=int, default=32,
                   help="with --geom-decode: RANSAC seed subset count "
                        "(ops/geom.py ransac_subsets; 0 = least-squares "
                        "seed) — the cost/robustness knob")
    p.add_argument("--geom-fill", action="store_true",
                   help="with --geom-decode: also fill undetected in-frame "
                        "ids from the fitted homography + RefineNet pass — "
                        "completes the README-recommended production "
                        "configuration")
    p.add_argument("--rn-decode", choices=["soft", "offset", "avg"],
                   default=None,
                   help="RefineNet heatmap decode (avg = the RN-32 shipped "
                        "accuracy configuration; needs an offset-head "
                        "checkpoint). Default: reference hard argmax")
    p.add_argument("--fused-head", action="store_true",
                   help="A/B the detector→keypoints stage: XLA heads + jnp "
                        "decode vs the fused Pallas head+decode kernel "
                        "(ops/pallas_fused.py); checks output agreement")
    return p


def _frame(cfg, args):
    import numpy as np

    if args.image:
        import cv2

        img = cv2.imread(args.image)
        img = cv2.resize(img, cfg.input_size)
        return img
    from deepcharuco_tpu import board as B

    brd = B.get_board(cfg)
    mins = min(cfg.input_size)
    bimg, _ = B.board_image(brd, (mins, mins), cfg.row_count, cfg.col_count)
    h, w = cfg.input_hw
    frame = np.full((h, w, 3), 90, np.uint8)
    x0 = (w - mins) // 2
    frame[:mins, x0:x0 + mins] = bimg
    return frame


def _input_variants(x, n):
    """Device-resident content-varied copies of a frame batch: per-copy iid
    noise defeats the tunnel's identical-execution replay (CLAUDE.md
    measurement hygiene; a repeated SAME-payload dispatch can read impossibly
    fast). Inputs stay resident, so the loop still times dispatch+compute,
    not transfer. Callers pass n = the iteration count so no (program,
    input) pair repeats inside a timed loop."""
    import jax
    import numpy as np

    rng = np.random.default_rng(3)
    host = np.asarray(x)
    out = []
    for _ in range(n):
        if host.dtype == np.uint8:
            noise = rng.integers(-15, 16, host.shape, dtype=np.int16)
            v = np.clip(host.astype(np.int16) + noise, 0, 255).astype(np.uint8)
        else:
            v = (host + rng.normal(0, 0.01, host.shape)).astype(host.dtype)
        out.append(jax.device_put(v))
    return out


def _time_fn(fn, args_tuples, iters, warmup, depth=2, fetch="all"):
    """Time ``fn`` over a *list* of argument tuples, cycled per iteration —
    every call gets content-varied input (see :func:`_input_variants`) and
    every result is value-fetched (``profiling.force_fetch`` — the only
    completion signal the tunnel cannot fake). ``depth`` results stay in
    flight, so the figure is throughput incl. dispatch.

    ``depth`` reconciles this harness with the repo-root ``bench.py``
    (VERDICT r3 weak #4: an 18% disagreement on the nominally same
    program): the official protocol keeps TWO dispatches in flight while
    fetching, which overlaps each result's host round trip (~15 ms through
    the tunnel) with the next batch's compute; the previous depth-1 loop
    here serialized one fetch RTT into every iteration — measured 256-batch
    two-stage 85.9 ms vs 70.2 ms per step, exactly one RTT apart. Default
    now matches bench.py (depth 2); ``--depth 1`` reproduces the old
    figure. See BENCH_NOTES "Round-4 harness reconciliation".
    """
    import collections

    import numpy as np

    from deepcharuco_tpu.profiling import force_fetch

    # "refined" = bench.py's exact completion fetch: the refined-corners
    # array only (out[2], ~32 KB at batch 256). "all" additionally downloads
    # every other output leaf — identical at healthy tunnel bandwidth,
    # +10-20 ms/iter when the tunnel degrades to ~0.01 GB/s.
    grab = (force_fetch if fetch == "all"
            else lambda out: np.asarray(out[2]))
    n = len(args_tuples)
    for i in range(warmup):
        out = fn(*args_tuples[i % n])
    grab(out)
    q = collections.deque()
    t0 = time.perf_counter()
    for i in range(iters):
        q.append(fn(*args_tuples[i % n]))
        if len(q) > depth:
            grab(q.popleft())
    while q:
        grab(q.popleft())
    return time.perf_counter() - t0


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deepcharuco_tpu.configs import default_config, load_configuration
    from deepcharuco_tpu.pipeline import (
        full_forward,
        is_quantized_npz,
        load_detector_any,
        load_model_variables,
        two_stage_forward,
    )
    from deepcharuco_tpu.models import RefineNet
    from deepcharuco_tpu.board import inner_corner_object_points

    cfg = load_configuration(args.config) if args.config else default_config()
    if args.size:
        import dataclasses as _dc

        w, h = (int(v) for v in args.size.lower().split("x"))
        cfg = _dc.replace(cfg, input_size=(w, h))
    # Routes an int8 artifact (scripts/quantize_detector.py) through
    # QuantDetector automatically — same apply() contract, so every timed
    # program below accepts it unchanged.
    det_quant = "int8" if is_quantized_npz(args.deepc) else None
    det, dv = load_detector_any(args.deepc, cfg.n_ids)
    rn = RefineNet(patch_size=args.rn_patch_size,
                   offset_head=args.rn_decode in ("offset", "avg"))
    dv = jax.device_put(dv)
    if args.refinenet is None and args.rn_patch_size != 24:
        ps = args.rn_patch_size
        rv = rn.init(jax.random.PRNGKey(0), jnp.zeros((1, ps, ps, 1)))
    else:
        rv = load_model_variables(args.refinenet, "refinenet")
    rv = jax.device_put(rv)

    if args.hires:
        from deepcharuco_tpu.configs import scaled_config

        frame_cfg = scaled_config(cfg, args.hires)  # frames come in at s×
    else:
        frame_cfg = cfg
    frame = _frame(frame_cfg, args)
    if args.input == "gray":
        import cv2

        frame = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)

    # Fail fast on configurations past the measured HBM ceiling (batch 256
    # @VGA OOMs at 18.75 GB of 15.75 GB — BENCH_NOTES round-4) instead of
    # dying mid-run with a raw XLA allocation error.
    from deepcharuco_tpu.serving import check_hbm_budget

    eff_batch = (max(1, args.stream_chunk) * args.multi_stream
                 if args.multi_stream > 0 else args.batch)
    # Under the hires tap the detector (the activation hog) runs on the
    # pooled view — budget at that resolution, not the raw input's (the
    # full-res side costs only the uint8 frames + patch gathers).
    gh, gw = frame.shape[0], frame.shape[1]
    if args.hires:
        gh, gw = gh // args.hires, gw // args.hires
    try:
        check_hbm_budget(eff_batch, gh, gw, context="benchmark batch")
    except ValueError as e:
        raise SystemExit(str(e))

    if args.multi_stream > 0:
        # BASELINE config #5: N independent streams at the configured
        # resolution through serving.StreamServer (one fused executable,
        # double-buffered steps; results fetched by the server itself —
        # honest completion by construction).
        from deepcharuco_tpu.pipeline import InferencePipeline
        from deepcharuco_tpu.serving import (DeviceQueueServer, StreamServer,
                                             VideoStream)

        pipe = InferencePipeline(cfg, dv, rv,
                                 det_quant=det_quant,
                                 rn_patch_size=args.rn_patch_size,
                                 rn_decode=args.rn_decode,
                                 hires=args.hires,
                                 geom_decode=args.geom_decode,
                                 geom_fill=args.geom_fill,
                                 geom_ransac=args.geom_ransac)
        rng = np.random.default_rng(0)

        # Pre-materialize every frame BEFORE the timed loop (round 4): the
        # noise synthesis is ~5-10 ms/frame of 1-core host work, and with
        # lazy generators it ran inside the timing window — at 8 VGA
        # streams it DOMINATED the measurement (both serving modes read
        # ~39-40 fps = host synthesis speed, not serving speed). A
        # deployment's frames arrive from cameras; the serving benchmark
        # times upload + dispatch + fetch, not frame synthesis. Content
        # stays unique per frame/stream (value-fetch honesty protocol).
        def stream_frames(sid):
            out = []
            for i in range(args.frames_per_stream):
                noise = rng.integers(-25, 26, frame.shape, np.int16)
                out.append(np.clip(frame.astype(np.int16) + noise + sid,
                                   0, 255).astype(np.uint8))
            return out

        def make_server(streams):
            if args.stream_chunk > 0:
                return DeviceQueueServer(pipe, streams,
                                         chunk=args.stream_chunk)
            return StreamServer(pipe, streams)

        streams = [VideoStream(iter(stream_frames(s)), name=f"s{s}")
                   for s in range(args.multi_stream)]
        server = make_server(streams)
        # warmup: a throwaway server at the SAME stream count (= same batch
        # shape = same executable) compiles the program outside the timing
        warm_frames = max(1, args.stream_chunk)
        warm = [VideoStream(iter([frame] * warm_frames), name="warm")
                for _ in range(args.multi_stream)]
        for _ in make_server(warm).run():
            pass
        n_frames = 0
        lat = []
        t0 = time.perf_counter()
        t_prev = t0
        for results in server.run():
            now = time.perf_counter()
            lat.append(now - t_prev)
            t_prev = now
            n_frames += len(results)
        dt = time.perf_counter() - t0
        h, w = frame.shape[:2]
        if args.stream_chunk > 0:
            # steps inside a fetched chunk yield back-to-back; the honest
            # latency figure is the chunk boundary (p95), not the median
            lat_txt = (f"chunk-boundary latency "
                       f"{1000 * float(np.percentile(lat, 95)):.1f} ms "
                       f"(+{args.stream_chunk} frame-intervals queueing)")
            mode = f" (device-queue chunk={args.stream_chunk})"
        else:
            lat_txt = f"median step latency {1000 * np.median(lat):.1f} ms"
            mode = ""
        print(f"multi-stream: {args.multi_stream} streams @ {w}x{h}"
              f"{' (hires tap)' if args.hires else ''}{mode}: "
              f"{n_frames / dt:.1f} fps aggregate "
              f"({n_frames / dt / args.multi_stream:.1f} fps/stream), "
              f"{lat_txt}")
        return
    frames = np.broadcast_to(frame, (args.batch, *frame.shape)).copy()
    x = jnp.asarray(frames)

    if args.hires and (args.breakdown or args.fused_head):
        raise SystemExit("--hires composes with --with-pose only "
                         "(breakdown/fused-head time the base-res stages)")
    if det_quant and args.fused_head:
        raise SystemExit("--fused-head needs the f32 detector "
                         "(trunk_only tap); pass an f32 checkpoint")
    obj = jnp.asarray(inner_corner_object_points(cfg.row_count, cfg.col_count,
                                                 cfg.square_len))
    gxy = obj[:, :2] if args.geom_decode else None
    if args.with_pose:
        h, w = cfg.input_hw
        K = jnp.asarray(np.array([[w, 0, w / 2], [0, w, h / 2], [0, 0, 1]], np.float32))
        dist = jnp.zeros(5, jnp.float32)
    geom_kw = dict(geom_board_xy=gxy, geom_ransac=args.geom_ransac,
                   geom_fill=args.geom_fill)
    if args.with_pose:
        if args.hires:
            from deepcharuco_tpu.pipeline import full_forward_hires

            dist12 = jnp.zeros(12, jnp.float32)
            fn = jax.jit(lambda dv, rv, x: full_forward_hires(
                det, rn, dv, rv, x, cfg.n_ids, obj, K, dist12,
                rn_decode=args.rn_decode, scale=args.hires, **geom_kw))
        else:
            fn = jax.jit(lambda dv, rv, x: full_forward(
                det, rn, dv, rv, x, cfg.n_ids, obj, K, dist,
                rn_decode=args.rn_decode, **geom_kw))
    elif args.hires:
        from deepcharuco_tpu.pipeline import two_stage_forward_hires

        fn = jax.jit(lambda dv, rv, x: two_stage_forward_hires(
            det, rn, dv, rv, x, cfg.n_ids,
            rn_decode=args.rn_decode or "soft", scale=args.hires, **geom_kw))
    else:
        fn = jax.jit(lambda dv, rv, x: two_stage_forward(
            det, rn, dv, rv, x, cfg.n_ids,
            rn_decode=args.rn_decode, **geom_kw))

    xs = _input_variants(x, args.iters)
    dt = _time_fn(fn, [(dv, rv, v) for v in xs], args.iters, args.warmup,
                   depth=args.depth, fetch=args.fetch)
    fps = args.batch * args.iters / dt
    label = "full+pose" if args.with_pose else "two-stage"
    if args.hires:
        label += " (hires tap)"
    if args.geom_decode:
        label += " (geom decode)"
    print(f"{label}: {fps:.1f} fps  ({dt / args.iters * 1000:.2f} ms / batch of {args.batch})")

    if args.breakdown:
        from deepcharuco_tpu.ops import normalize_gray

        # The detector program returns its full logit maps (so XLA can't
        # dead-code-eliminate either head) PLUS a tiny completion leaf at
        # index 2 where _time_fn's `--fetch refined` grab looks: fetching
        # the ~100 MB of batch-256 logits per iteration benchmarks the
        # tunnel, not the chip (measured: "detector-only 133 fps" vs 3.7k
        # fps two-stage under fetch=all on a degraded tunnel).
        def det_prog(dv, x):
            out = det.apply(dv, normalize_gray(x))
            return out["loc"], out["ids"], out["loc"][:, 0, 0, :2]

        det_fn = jax.jit(det_prog)
        dt_d = _time_fn(det_fn, [(dv, v) for v in xs], args.iters, args.warmup,
                        depth=args.depth, fetch=args.fetch)
        print(f"detector-only: {args.batch * args.iters / dt_d:.1f} fps")
        two = jax.jit(lambda dv, rv, x: two_stage_forward(det, rn, dv, rv, x, cfg.n_ids))
        dt_2 = _time_fn(two, [(dv, rv, v) for v in xs], args.iters, args.warmup,
                        depth=args.depth, fetch=args.fetch)
        print(f"two-stage: {args.batch * args.iters / dt_2:.1f} fps")

    if args.fused_head:
        from deepcharuco_tpu.ops import normalize_gray
        from deepcharuco_tpu.ops.decode import pred_to_keypoints
        from deepcharuco_tpu.ops.pallas_fused import (
            fold_head_params,
            pallas_fused_head_decode,
        )

        host_dv = jax.tree.map(np.asarray, dv)
        folded = jax.device_put(fold_head_params(host_dv, cfg.n_ids))

        def xla_path(dv, x):
            out = det.apply(dv, normalize_gray(x))
            return pred_to_keypoints(out["loc"], out["ids"], cfg.n_ids)

        def fused_path(dv, folded, x):
            trunk = det.apply(dv, normalize_gray(x), trunk_only=True)["trunk"]
            return pallas_fused_head_decode(trunk, folded, cfg.n_ids)

        xla_fn = jax.jit(xla_path)
        fused_fn = jax.jit(fused_path)
        kx, vx = jax.tree.map(np.asarray, xla_fn(dv, x))
        kf, vf = jax.tree.map(np.asarray, fused_fn(dv, folded, x))
        both = vx & vf
        agree_valid = float((vx == vf).mean())
        agree_kpts = float((np.abs(kx - kf).max(-1)[both] < 1e-6).mean()) \
            if both.any() else 1.0
        dt_x = _time_fn(xla_fn, [(dv, v) for v in xs], args.iters, args.warmup,
                        depth=args.depth)
        dt_f = _time_fn(fused_fn, [(dv, folded, v) for v in xs],
                        args.iters, args.warmup, depth=args.depth)
        print(f"detector→keypoints XLA:   {args.batch * args.iters / dt_x:.1f} fps "
              f"({dt_x / args.iters * 1000:.2f} ms/batch)")
        print(f"detector→keypoints fused: {args.batch * args.iters / dt_f:.1f} fps "
              f"({dt_f / args.iters * 1000:.2f} ms/batch)")
        print(f"agreement: valid {agree_valid:.4f}, coords(valid∩) {agree_kpts:.4f}")


if __name__ == "__main__":
    main()
