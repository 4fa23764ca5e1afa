"""CLI: the reference's four subcommands (reference ``__main__.py:11-124``)
plus TPU-era extras (``--resume``, config overrides, ``export``,
``serve``).

    python -m musicgan_tpu create_dataset "/data/*.wav" -o /data/ds
    python -m musicgan_tpu train RUN -i /data/ds -o /runs/out [--resume]
    python -m musicgan_tpu generate CKPT 32 -o /out [-n 10] [-m 5]
    python -m musicgan_tpu view_audio --input-audio a.wav --image-idx 0
    python -m musicgan_tpu serve CKPT --port 8765
    python -m musicgan_tpu export CKPT -o gen.pt
    python -m musicgan_tpu eval RUN_DIR --corpus /data/wav
"""

from __future__ import annotations

import argparse


def _add_holdout_args(p: argparse.ArgumentParser) -> None:
    """Held-out scoring axis, shared by ``eval`` and ``compare`` (round-4
    VERDICT item 4: the training-corpus score alone cannot distinguish
    memorization from generalization)."""
    p.add_argument(
        "--holdout-frac", type=float, default=0.0,
        help="deterministically hold out this fraction of corpus tracks "
             "and report nearest-held-out distance + gap beside the "
             "training-corpus score")
    p.add_argument(
        "--holdout-dir", type=str, default=None,
        help="directory of WAV tracks the generator never trained on "
             "(scored as the held-out reference; mutually exclusive "
             "with --holdout-frac)")
    p.add_argument(
        "--holdout-seed", type=int, default=17,
        help="seed for the --holdout-frac track split")


def main() -> None:
    parser = argparse.ArgumentParser("musicgan_tpu")
    # Shared by every subcommand.  A --platform flag (not an env var)
    # because some launch environments pin JAX_PLATFORMS at interpreter
    # startup — overriding it from the environment can hang before user
    # code runs (observed live: a dead device tunnel + JAX_PLATFORMS=cpu
    # wedged `import jax` itself); jax.config.update after import is the
    # reliable path.
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument(
        "--platform", type=str, default=None, metavar="BACKEND",
        help="force a jax platform (e.g. 'cpu' to run a CPU-safe "
             "export/eval while the accelerator is busy or unreachable)")
    def _subparser(**kw):  # every subcommand inherits the common flags
        return argparse.ArgumentParser(parents=[common], **kw)

    sub = parser.add_subparsers(
        dest="mode", required=True, parser_class=_subparser
    )

    p = sub.add_parser("create_dataset", help="WAVs -> packed spectrogram shards")
    p.add_argument("audio_path", type=str, help="can be /path/to/*.wav")
    p.add_argument("-o", "--output-dir", type=str, required=True)
    p.add_argument("-w", "--num-workers", type=int, default=None)
    p.add_argument("--samples-per-shard", type=int, default=128)

    # allow_abbrev=False: the supervisor re-invokes this command minus the
    # exact '--max-restarts' token; an abbreviated spelling (--max-restart)
    # would survive the strip and nest supervisors recursively.
    p = sub.add_parser(
        "train", help="progressive WGAN-GP training", allow_abbrev=False
    )
    p.add_argument("run", type=str, metavar="RUN_NAME")
    p.add_argument("-o", "--out-path", dest="out_path", type=str, required=True)
    p.add_argument("-i", "--input-dataset", dest="input_dataset", type=str,
                   required=True)
    p.add_argument("--resume", action="store_true",
                   help="resume from the latest checkpoint in out-path")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--nb-epoch", type=int, default=None)
    p.add_argument("--max-iters", type=int, default=None)
    p.add_argument("--max-stage", type=int, default=None,
                   help="cap growth (e.g. 3 => 32x32)")
    p.add_argument("--save-every", type=int, default=None)
    p.add_argument("--log-every", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--compute-dtype", type=str, default=None,
                   choices=["float32", "bfloat16", "bfloat16_f32gp"],
                   help="bfloat16_f32gp = bf16 forwards with the gradient-"
                        "penalty branch pinned f32 (VALIDATION.md r3)")
    p.add_argument("--device-dataset", type=str, default=None,
                   choices=["auto", "on", "off"],
                   help="corpus resident in HBM, indices per dispatch "
                        "(auto: single-device runs under the byte budget)")
    p.add_argument("--drift-eps", type=float, default=None,
                   help="ProGAN eps-drift penalty on E[D(real)^2] "
                        "(0 = reference-faithful; ~1e-3 stabilizes the "
                        "critic scale on small corpora)")
    p.add_argument("--ema-decay", type=float, default=None,
                   help="generator weight EMA for eval/preview/export "
                        "(0 = reference-faithful; ~0.999 makes the final "
                        "checkpoint the run's best — ProGAN/GANSynth "
                        "convention)")
    p.add_argument("--chunk-steps", type=int, default=None,
                   help="iterations per device dispatch (lax.scan)")
    p.add_argument("--profile", type=str, default=None, metavar="TRACE_DIR",
                   help="capture a jax.profiler trace of the run")
    p.add_argument("--tb-dir", type=str, default=None, metavar="LOG_DIR",
                   help="also write metrics to a TensorBoard event log "
                        "(lead host, log cadence — no per-step syncs)")
    p.add_argument("--mlflow-uri", type=str, default=None, metavar="URI",
                   help="also log params+metrics to an MLflow tracking "
                        "store (reference train.py:24-30; requires the "
                        "mlflow package)")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise at the first non-finite value inside jit")
    # multi-host bring-up (jax.distributed)
    p.add_argument("--coordinator", type=str, default=None,
                   help="coordinator address host:port for multi-host runs")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    # failure detection / supervised restart (utils/watchdog.py)
    p.add_argument("--stall-timeout", type=float, default=None,
                   metavar="SECONDS",
                   help="abort (exit 75) when no device progress is seen "
                        "for this long — a wedged accelerator dispatch "
                        "never returns on its own; pairs with "
                        "--max-restarts (default: 900 when --max-restarts "
                        "is set, else off)")
    p.add_argument("--max-restarts", type=int, default=0, metavar="N",
                   help="supervise the run: relaunch up to N times with "
                        "--resume when it exits 75 (stall watchdog) or "
                        "dies on a signal (preemption); other failures "
                        "are not retried")

    p = sub.add_parser("generate", help="sample latents -> WAV files")
    p.add_argument("gen_dict_state", type=str,
                   help="musicgan_tpu checkpoint dir or reference gen_*.pt")
    p.add_argument("rand_channels", type=int)
    p.add_argument("-n", "--nb-vec", type=int, default=10)
    p.add_argument("-m", "--nb-music", type=int, default=5)
    p.add_argument("-o", "--output-dir", type=str, required=True)
    p.add_argument("--seed", type=int, default=0)

    p = sub.add_parser("view_audio", help="WAV -> magnitude/phase images")
    p.add_argument("--input-audio", type=str, required=True)
    p.add_argument("--image-idx", type=int, required=True)
    p.add_argument("-o", "--output-dir", type=str, default=None)

    p = sub.add_parser(
        "serve", help="long-running synthesis HTTP server (params resident)"
    )
    p.add_argument("gen_ckpt", type=str,
                   help="musicgan_tpu checkpoint dir or reference gen_*.pt")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8765)
    p.add_argument("--rand-channels", type=int,
                   default=None)
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batch cap per compiled dispatch")
    p.add_argument("--window-ms", type=float, default=10.0,
                   help="micro-batching collection window")
    p.add_argument("--stage", type=int, default=7)
    p.add_argument("--no-warmup", action="store_true")

    p = sub.add_parser(
        "eval",
        help="audition a run's checkpoints and score them against a corpus",
    )
    p.add_argument("run_dir", type=str,
                   help="training output dir (contains checkpoints/)")
    p.add_argument("--corpus", type=str, default=None,
                   help="directory of corpus WAV tracks; when given, score "
                        "each checkpoint's corpus-likeness + diversity "
                        "after rendering")
    p.add_argument("-o", "--out-dir", type=str, default=None,
                   help="audition output dir (default RUN_DIR/audition)")
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--nb-vec", type=int, default=2)
    p.add_argument("--saves", type=str, default=None,
                   help="comma-separated save indices (default: all)")
    p.add_argument("--raw-weights", action="store_true",
                   help="audition raw generator weights even when the "
                        "checkpoint carries an EMA copy")
    p.add_argument("--json-out", type=str, default=None,
                   help="write the score table as JSON (requires --corpus)")
    _add_holdout_args(p)

    p = sub.add_parser(
        "compare",
        help="head-to-head artifact scoring: render the SAME latents "
             "through each checkpoint/.pt and score all against a corpus",
    )
    p.add_argument("ckpts", nargs="+",
                   help="two or more artifacts: reference gen_*.pt files "
                        "or our checkpoint/run dirs")
    p.add_argument("--corpus", type=str, required=True,
                   help="directory of corpus WAV tracks")
    p.add_argument("--seeds", type=int, default=8)
    p.add_argument("--nb-vec", type=int, default=2)
    p.add_argument("--latent-seed", type=int, default=1234,
                   help="latent RNG seed (same latents for every artifact)")
    p.add_argument("-o", "--out-dir", type=str, default=None,
                   help="keep the rendered WAVs here (default: temp dir)")
    p.add_argument("--json-out", type=str, default=None)
    _add_holdout_args(p)

    sub.add_parser(
        "info", help="environment diagnostics: devices, native ops, autotune"
    )

    p = sub.add_parser(
        "export", help="export a trained generator as a reference-format .pt"
    )
    p.add_argument("ckpt", type=str, help="musicgan_tpu checkpoint dir")
    p.add_argument("-o", "--output", type=str, required=True)
    p.add_argument("--stage", type=int, default=7,
                   help="growth stage for a single-.pt export (ignored "
                        "with --full, which uses the checkpoint's "
                        "recorded stage)")
    p.add_argument("--full", action="store_true",
                   help="write the reference Saver's complete four-file "
                        "save (gen/disc/optim_gen/optim_disc _{i}.pt, "
                        "reference utils.py:118-145) into the OUTPUT "
                        "directory — weights AND Adam state, so reference "
                        "tooling gets everything its own saves carry")
    p.add_argument("--save-idx", type=int, default=None,
                   help="index i in the exported file names (--full; "
                        "default: the source checkpoint's save index)")

    p = sub.add_parser(
        "import",
        help="convert a reference save directory (the four *_{i}.pt files) "
             "into a native run dir that `train -o DIR --resume` continues "
             "— weights, Adam moments and per-param step counts included",
    )
    p.add_argument("ref_dir", type=str,
                   help="directory holding gen_{i}.pt / disc_{i}.pt / "
                        "optim_gen_{i}.pt / optim_disc_{i}.pt")
    p.add_argument("save_idx", type=int, help="reference save index i")
    p.add_argument("-o", "--output", type=str, required=True,
                   help="run directory to create (gets checkpoints/save_0)")
    p.add_argument("--iter", type=int, default=None,
                   help="iteration counter to resume at (default: "
                        "save_idx * 1000, the reference's save cadence)")

    args = parser.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    if args.mode != "create_dataset":  # ingest never touches the device
        from .utils.cache import enable_compilation_cache

        enable_compilation_cache()

    if args.mode == "create_dataset":
        from .audio.ingest import create_dataset

        index = create_dataset(
            args.audio_path,
            args.output_dir,
            num_workers=args.num_workers,
            samples_per_shard=args.samples_per_shard,
        )
        print(
            f"wrote {index['total_samples']} samples in "
            f"{len(index['shards'])} shards to {args.output_dir}"
        )
        for path, err in index["errors"]:
            print(f"  ERROR {path}: {err}")

    elif args.mode == "train":
        import contextlib

        if args.max_restarts > 0:
            # Become the supervisor: re-invoke this same command as a
            # child (minus --max-restarts, plus --resume from attempt 1)
            # and retry stall-watchdog exits / signal deaths.
            import sys

            from .utils.supervise import run_supervised

            base = [a for a in sys.argv[1:]]
            # strip --max-restarts N (both "--max-restarts N" and "=N")
            child_args = []
            skip = False
            for a in base:
                if skip:
                    skip = False
                    continue
                if a == "--max-restarts":
                    skip = True
                    continue
                if a.startswith("--max-restarts="):
                    continue
                child_args.append(a)
            if args.stall_timeout is None:
                child_args += ["--stall-timeout", "900"]

            def make_cmd(attempt):
                extra = (
                    ["--resume"]
                    if attempt > 0 and "--resume" not in child_args
                    else []
                )
                return (
                    [sys.executable, "-m", "musicgan_tpu"]
                    + child_args
                    + extra
                )

            raise SystemExit(run_supervised(make_cmd, args.max_restarts))

        from .config import train_config_from_overrides
        from .parallel import initialize_distributed
        from .train import train
        from .utils.profiling import enable_debug_mode, trace

        initialize_distributed(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        if args.debug_nans:
            enable_debug_mode(nans=True)

        cfg = train_config_from_overrides(
            batch_size=args.batch_size,
            nb_epoch=args.nb_epoch,
            max_stage=args.max_stage,
            save_every=args.save_every,
            log_every=args.log_every,
            seed=args.seed,
            compute_dtype=args.compute_dtype,
            chunk_steps=args.chunk_steps,
            drift_eps=args.drift_eps,
            ema_decay=args.ema_decay,
            device_dataset=args.device_dataset,
            stall_timeout_s=args.stall_timeout,
            tb_dir=args.tb_dir,
            mlflow_uri=args.mlflow_uri,
        )
        ctx = trace(args.profile) if args.profile else contextlib.nullcontext()
        with ctx:
            train(
                args.run,
                args.input_dataset,
                args.out_path,
                train_cfg=cfg,
                resume=args.resume,
                max_iters=args.max_iters,
            )
        from .train.loop import PREEMPTED
        from .utils.watchdog import EXIT_STALLED

        if PREEMPTED.is_set():
            # SIGTERM/SIGUSR1 preemption: the loop flushed a checkpoint
            # and stopped early — exit EX_TEMPFAIL so schedulers (and
            # --max-restarts supervision) treat this run as retryable.
            raise SystemExit(EXIT_STALLED)

    elif args.mode == "generate":
        from .generate import generate

        paths = generate(
            args.output_dir,
            args.rand_channels,
            args.gen_dict_state,
            nb_vec=args.nb_vec,
            nb_music=args.nb_music,
            seed=args.seed,
        )
        print("\n".join(paths))

    elif args.mode == "view_audio":
        from .view_audio import view_audio

        for p_ in view_audio(
            args.input_audio, args.image_idx, output_dir=args.output_dir
        ):
            print(p_)

    elif args.mode == "serve":
        from .config import ModelConfig
        from .serve import serve

        serve(
            args.gen_ckpt,
            host=args.host,
            port=args.port,
            rand_channels=(
                ModelConfig.rand_channels
                if args.rand_channels is None
                else args.rand_channels
            ),
            max_batch=args.max_batch,
            window_ms=args.window_ms,
            stage=args.stage,
            warmup=not args.no_warmup,
        )

    elif args.mode == "eval":
        if args.json_out and not args.corpus:
            parser.error("eval: --json-out requires --corpus (scores are "
                         "corpus-referenced; without a corpus no JSON is "
                         "produced)")
        from .evaluate import audition_run, score_auditions

        out = audition_run(
            args.run_dir,
            out_dir=args.out_dir,
            seeds=args.seeds,
            nb_vec=args.nb_vec,
            saves=([int(s) for s in args.saves.split(",")]
                   if args.saves else None),
            raw_weights=args.raw_weights,
        )
        if args.corpus:
            score_auditions(
                out, args.corpus, json_out=args.json_out,
                holdout_frac=args.holdout_frac,
                holdout_dir=args.holdout_dir,
                holdout_seed=args.holdout_seed,
            )

    elif args.mode == "compare":
        from .evaluate import compare_artifacts

        compare_artifacts(
            args.ckpts, args.corpus, seeds=args.seeds, nb_vec=args.nb_vec,
            seed=args.latent_seed, out_dir=args.out_dir,
            json_out=args.json_out,
            holdout_frac=args.holdout_frac,
            holdout_dir=args.holdout_dir,
            holdout_seed=args.holdout_seed,
        )

    elif args.mode == "info":
        import json as _json
        import platform
        import threading

        import jax

        from . import native
        from .ops import autotune

        # Device enumeration can block FOREVER on a wedged/dead device
        # tunnel (no exception path in PJRT; observed live — VALIDATION
        # r3).  `info` is exactly the tool a user reaches for when the
        # device is misbehaving, so probe in a daemon thread and report
        # the hang as a diagnostic instead of becoming one.
        dev_result: dict = {}

        def _probe():
            dev_result["backend"] = jax.default_backend()
            dev_result["devices"] = [str(d) for d in jax.devices()]
            dev_result["process_count"] = jax.process_count()

        t = threading.Thread(target=_probe, daemon=True)
        t.start()
        t.join(timeout=60.0)
        if t.is_alive():
            dev_result = {
                "backend": "UNRESPONSIVE (device init exceeded 60s — "
                           "wedged/dead tunnel?)",
                "devices": [],
                "process_count": None,
            }

        info = {
            "python": platform.python_version(),
            "jax": jax.__version__,
            **dev_result,
            "native_ingest": native.is_available(),
            "native_lib": native.lib_path() if native.is_available() else None,
            "autotune_cache": autotune._load_persisted(),
        }
        print(_json.dumps(info, indent=1))

    elif args.mode == "export":
        if args.full:
            import jax

            from .config import ModelConfig, TrainConfig
            from .models.torch_ingest import export_reference_save
            from .train.checkpoint import (
                CheckpointManager,
                resolve_checkpoint,
            )
            from .train.step import init_train_state

            root, save_idx = resolve_checkpoint(args.ckpt)
            mgr = CheckpointManager(root)
            model_cfg, defaults = ModelConfig(), TrainConfig()
            template = init_train_state(jax.random.PRNGKey(0), model_cfg)
            state, meta = mgr.restore(save_idx, template)
            stage = min(
                int(meta["grower"]["curr_grow"]), model_cfg.n_stages - 1
            )
            # optimizer hyperparams ride the exported param groups: use
            # the RUN'S recorded values (meta carries the full train_cfg),
            # not the defaults — a 5e-4 run exported at lr=1e-3 would
            # silently retrain at 2x lr in the reference
            tc = meta.get("train_cfg") or {}
            out_idx = (
                args.save_idx if args.save_idx is not None else save_idx
            )
            print(
                f"exporting save_{save_idx} at stage {stage} (from "
                "checkpoint meta; --stage applies to single-.pt exports "
                "only)"
            )
            paths = export_reference_save(
                state, args.output, out_idx, stage=stage, cfg=model_cfg,
                gen_lr=float(tc.get("gen_lr", defaults.gen_lr)),
                disc_lr=float(tc.get("disc_lr", defaults.disc_lr)),
                betas=tuple(tc.get("betas", defaults.betas)),
            )
            for p_ in paths:
                print(p_)
        else:
            from .generate import load_generator_params
            from .models.torch_ingest import export_reference_generator

            params = load_generator_params(args.ckpt)
            export_reference_generator(params, args.output, stage=args.stage)
            print(args.output)

    elif args.mode == "import":
        from .models.torch_ingest import import_reference_run

        _, stage = import_reference_run(
            args.ref_dir, args.save_idx, args.output, iter_idx=args.iter
        )
        print(
            f"{args.output}/checkpoints/save_0 (stage {stage}) — continue "
            f"with: python -m musicgan_tpu train <dataset> -o {args.output} "
            f"--resume"
        )


if __name__ == "__main__":
    main()
