"""RefineNet training CLI — replacement for reference ``src/train_refinenet.py``.

The reference trains with a *virtual* batch: ``bs // total`` background images
each yielding ``total=8`` (patch, heatmap) pairs (``train_refinenet.py:14-25``);
the Lightning step stacks and flattens them (``refinenet.py:163-171``). Here
the dataset emits the (total, …) block per image and the step flattens — same
effective batch, one jit.
"""

from __future__ import annotations

import argparse
import time


def build_argparser():
    p = argparse.ArgumentParser(description="Train RefineNet on TPU")
    p.add_argument("--config", default=None)
    p.add_argument("--steps", type=int, default=20000)
    p.add_argument("--eval-every", type=int, default=500)
    p.add_argument("--eval-batches", type=int, default=4)
    p.add_argument("--batch-size", type=int, default=None,
                   help="patches per step (override bs_train_rn)")
    p.add_argument("--total", type=int, default=8, help="patches per image")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--logdir", default="tb_logs/refinenet")
    p.add_argument("--ckpt-dir", default="checkpoints/refinenet")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--num-workers", type=int, default=None)
    p.add_argument("--resume", default=None)
    p.add_argument("--init-npz", default=None,
                   help="initialize params/batch_stats from a shipped .npz "
                        "artifact (fresh optimizer; for fine-tuning)")
    p.add_argument("--images", default=None)
    p.add_argument("--labels", default=None)
    p.add_argument("--device-synth", action="store_true",
                   help="generate patches ON the TPU (exact-subpixel labels); "
                        "host feeds PRNG keys only")
    p.add_argument("--frame-patches", action="store_true",
                   help="with --device-synth: crop patches from full synthetic "
                        "frames via the inference-time extract_patches gather "
                        "(zero train/test distribution gap)")
    p.add_argument("--rounded-targets", action="store_true",
                   help="quantize heatmap targets to the 1/8-px grid "
                        "(reference parity, data_refinenet.py:84-91); default "
                        "is continuous sub-pixel Gaussian centers for the "
                        "soft-argmax decode")
    p.add_argument("--patch-size", type=int, choices=[24, 32], default=24,
                   help="input patch size: 24 = reference parity; 32 = "
                        "wider-context variant (~33%% more board-edge "
                        "support pixels — targets the measured 0.37 px "
                        "input-information floor). Requires --device-synth; "
                        "--init-npz with 24-patch weights warm-starts the "
                        "shared layers (new conv2c/2d train fresh)")
    p.add_argument("--upsample", choices=["nearest", "bilinear"],
                   default="nearest",
                   help="decoder upsampling: nearest = reference parity; "
                        "bilinear = smoother interpolation (parameter-free, "
                        "checkpoint-compatible)")
    p.add_argument("--offset-weight", type=float, default=0.0,
                   help="weight of the direct offset-regression branch loss "
                        "(adds RefineNet(offset_head=True): image-px squared "
                        "error of the regressed (dx,dy) vs the target "
                        "sub-pixel offset); 0 = heatmap-only parity net")
    p.add_argument("--coord-weight", type=float, default=0.0,
                   help="weight of the soft-argmax coordinate loss (image-px "
                        "squared error between decoded predicted and target "
                        "positions); 0 = reference-parity MSE only")
    p.add_argument("--perspective-p", type=float, default=0.0,
                   help="with --frame-patches: probability of projective "
                        "source-frame warps (match the detector's "
                        "--perspective-p diet)")
    p.add_argument("--fused-steps", type=int, default=1,
                   help="with --device-synth: lax.scan K synthesis+train "
                        "steps per dispatch (RefineNet steps are tiny and "
                        "tunnel-dispatch-bound; K amortizes the latency)")
    p.add_argument("--frame-scale", type=int, default=1,
                   help="with --frame-patches: synthesize source frames at "
                        "N x the config resolution and crop patches from "
                        "them — trains the hi-res patch tap "
                        "(pipeline.two_stage_forward_hires; the reference's "
                        "s_factor=2 rendering, src/data_refinenet.py:97-100)")
    p.add_argument("--jitter-px", type=float, default=None,
                   help="patch-center jitter in source-frame px (default: 3 "
                        "at frame-scale 1; 2 x frame-scale above — the "
                        "64x64 heatmap covers only +-4 patch px around the "
                        "center, so jitter beyond that leaves targets "
                        "representable only by the offset branch)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from deepcharuco_tpu.configs import default_config, load_configuration
    from deepcharuco_tpu.data import BatchLoader, RefineNetDataset, device_prefetch
    from deepcharuco_tpu.models import RefineNet
    from deepcharuco_tpu.train import (
        create_refinenet_state,
        make_refinenet_eval_step,
        make_refinenet_train_step,
    )
    from deepcharuco_tpu.train.checkpoints import CheckpointManager
    from deepcharuco_tpu.train.logging import ScalarLogger
    from deepcharuco_tpu.train.metrics import MeanAccumulator, refinenet_metric

    cfg = load_configuration(args.config) if args.config else default_config()
    bs_patches = args.batch_size or cfg.bs_train_rn
    n_images = max(1, bs_patches // args.total)  # virtual batch (ref :22-25)
    workers = args.num_workers or cfg.num_workers
    print(f"virtual batch: {n_images} images x {args.total} patches")

    if args.patch_size != 24 and not args.device_synth:
        raise SystemExit("--patch-size 32 requires --device-synth (the host "
                         "RefineNetDataset emits reference-parity 24x24)")
    rn = RefineNet(dtype=jnp.float32, upsample=args.upsample,
                   patch_size=args.patch_size,
                   offset_head=args.offset_weight > 0.0)
    tx = optax.adam(args.lr)
    tx, state = create_refinenet_state(rn, jax.random.PRNGKey(0), tx=tx)

    if args.init_npz:
        from deepcharuco_tpu.pipeline import merge_variables, variables_from_npz

        v = variables_from_npz(args.init_npz)
        merged, loaded, skipped = merge_variables(
            {"params": state.params, "batch_stats": state.batch_stats}, v)
        state = state.replace(params=merged["params"],
                              batch_stats=merged["batch_stats"])
        print(f"initialized {len(loaded)} arrays from {args.init_npz}"
              + (f" ({len(skipped)} kept fresh/skipped — expected when "
                 "warm-starting a different patch size)" if skipped else ""))

    ckpts = CheckpointManager(args.ckpt_dir, top_k=args.top_k)
    if args.resume:
        from deepcharuco_tpu.train.checkpoints import unflatten_opt_state

        restored = ckpts.restore(args.resume)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        if "opt_state_flat" in restored:
            state = state.replace(
                opt_state=unflatten_opt_state(state.opt_state,
                                              restored["opt_state_flat"]),
                step=jnp.asarray(restored["step"], jnp.int32))
            print(f"resumed from {args.resume} at step "
                  f"{int(restored['step'])} (with optimizer state)")
        else:
            print(f"resumed from {args.resume} (params only — old-format "
                  "checkpoint; Adam moments reset)")

    device_synth = None
    loader = None
    if args.device_synth:
        from deepcharuco_tpu.data.device_synth import (
            DeviceRefineSynthesizer,
            FramePatchSynthesizer,
        )

        cont = not args.rounded_targets
        if args.frame_scale > 1 and not args.frame_patches:
            raise SystemExit("--frame-scale needs --frame-patches (the "
                             "direct patch sampler has no frame to scale)")
        if args.frame_patches:
            from deepcharuco_tpu.configs import scaled_config

            synth_cfg = (scaled_config(cfg, args.frame_scale)
                         if args.frame_scale > 1 else cfg)
            jitter = (args.jitter_px if args.jitter_px is not None
                      else 3.0 if args.frame_scale == 1
                      else 2.0 * args.frame_scale)
            device_synth = FramePatchSynthesizer(
                synth_cfg, continuous_targets=cont,
                patch_size=args.patch_size,
                perspective_p=args.perspective_p, jitter_px=jitter)
        else:
            device_synth = DeviceRefineSynthesizer(cfg, continuous_targets=cont,
                                                   patch_size=args.patch_size)
        batch_gen = device_synth.batch_fn(bs_patches)
        val_batch_fn = device_synth.batch_fn(32)

        def feed_gen():
            key = jax.random.PRNGKey(4321)
            while True:
                key, sub = jax.random.split(key)
                yield sub

        feed = feed_gen()
        val_ds = None
        print("on-device patch synthesis: host feeds PRNG keys only")
    else:
        train_ds = RefineNetDataset(cfg, labels=args.labels,
                                    images_folder=args.images, total=args.total)
        val_ds = RefineNetDataset(cfg, labels=args.labels,
                                  images_folder=args.images,
                                  validation=True, total=args.total)
        loader = BatchLoader(train_ds, n_images, num_workers=workers, seed=0)
        feed = device_prefetch(loader, size=2)

    def flatten(batch):
        ps = args.patch_size
        p = batch["patches"].reshape(-1, ps, ps, 1)
        h = batch["heatmaps"].reshape(-1, 64, 64, 1)
        return p, h

    step_fn = make_refinenet_train_step(rn, tx, coord_weight=args.coord_weight,
                                        offset_weight=args.offset_weight)
    step = jax.jit(step_fn, donate_argnums=(0,))
    K = max(1, args.fused_steps)
    fused_multi = None
    if device_synth is not None and K > 1:
        # One dispatch per K steps: patch synthesis + MSE step scanned in a
        # single jit (same amortization as cli/train --fused-steps).
        from deepcharuco_tpu.parallel import synth_scan_program

        fused_multi = jax.jit(
            synth_scan_program(step_fn,
                               lambda k: device_synth.batch_body(k, bs_patches),
                               fused_steps=K),
            donate_argnums=(0,))
    eval_fn = jax.jit(make_refinenet_eval_step(
        rn, offset_weight=args.offset_weight))
    metric_fn = jax.jit(refinenet_metric)

    logger = ScalarLogger(args.logdir)
    acc = MeanAccumulator()
    t0 = time.time()
    for i, batch in enumerate(feed):
        if i >= args.steps:
            break
        if fused_multi is not None:
            if i == 0:
                print(f"compiling fused {K}-step program...", flush=True)
            state, aux = fused_multi(state, batch)
            if i == 0:
                jax.block_until_ready(aux["loss"])
                print("fused program compiled", flush=True)
        elif device_synth is not None:
            patches, heat = batch_gen(batch)
            state, aux = step(state, patches, heat)
        else:
            patches, heat = flatten(batch)
            state, aux = step(state, patches, heat)
        acc.update(train_refinenet_loss=aux["loss"])

        if (i + 1) % args.eval_every == 0:
            train_scalars = acc.compute()
            acc.reset()
            ev = MeanAccumulator()
            for j in range(args.eval_batches):
                if device_synth is not None:
                    p, h = val_batch_fn(jax.random.PRNGKey(888 + j))
                    p, h = jnp.asarray(p), jnp.asarray(h)
                else:
                    items = [val_ds[j * 4 + k] for k in range(4)]
                    vb = {k: np.stack([it[k] for it in items]) for k in items[0]}
                    p, h = flatten(vb)
                    p, h = jnp.asarray(p), jnp.asarray(h)
                aux_v, heat_hat = eval_fn(state, p, h)
                d = metric_fn(heat_hat, h)
                ev.update(val_refinenet_loss=aux_v["loss"],
                          val_dist_refinenet_pixels=d)
            val_scalars = ev.compute()
            sps = args.eval_every / (time.time() - t0)
            t0 = time.time()
            logger.log(i + 1, {**train_scalars, **val_scalars,
                               "steps_per_sec": sps})
            print(f"step {i+1}: loss={train_scalars['train_refinenet_loss']:.5f} "
                  f"val={val_scalars['val_refinenet_loss']:.5f} "
                  f"val_dist={val_scalars['val_dist_refinenet_pixels']:.2f}px(8x) "
                  f"({sps:.1f} steps/s)")
            from deepcharuco_tpu.train.checkpoints import flatten_opt_state

            # Global-step names: a resumed run extends the prior series
            # instead of overwriting its checkpoint names (see cli/train.py).
            ckpts.save(f"step_{int(state.step):07d}",
                       {"params": state.params, "batch_stats": state.batch_stats,
                        "opt_state_flat": flatten_opt_state(state.opt_state),
                        "step": np.asarray(state.step)},
                       metric=val_scalars["val_refinenet_loss"])
    if loader is not None:
        loader.stop()
    logger.close()
    print(f"best checkpoint: {ckpts.best_checkpoint()}")


if __name__ == "__main__":
    main()
