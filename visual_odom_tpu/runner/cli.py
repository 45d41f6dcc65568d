"""Command-line interface.

Extends the reference's single positional-arg binary
(`./run <seq|rgbd> <calib.yaml> [gt_poses.txt]`, src/main.cpp:37-58) into
subcommands; `vo run` keeps argument-for-argument compatibility with the
reference invocation.

    vo run  <sequence_dir|synthetic> <calib.yaml> [gt_poses.txt] [options]
    vo eval --gt gt.txt --result poses.txt        # devkit scoring
    vo bench [options]                            # kernel + pipeline bench

The devkit scorer the reference ships but never wires up
(src/evaluate/evaluate_odometry.cpp:471-497 — main commented out) is a
first-class subcommand here.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


#: (flag, VOConfig field, type) — every algorithm constant the reference
#: hard-codes (SURVEY.md section 5 config: "everything overridable via CLI").
_CONFIG_FLAGS = [
    ("detector", "detector", str),          # fast | shi-tomasi
    ("fast-threshold", "fast_threshold", int),
    ("shi-tomasi-quality", "shi_tomasi_quality", float),
    ("shi-tomasi-min-distance", "shi_tomasi_min_distance", float),
    ("bucket-rows", "bucket_rows", int),
    ("features-per-bucket", "features_per_bucket", int),
    ("age-threshold", "age_threshold", int),
    ("replenish-below", "replenish_below", int),
    ("lk-window", "lk_window", int),
    ("lk-levels", "lk_levels", int),
    ("lk-iters", "lk_max_iters", int),
    ("lk-eps", "lk_eps", float),
    ("lk-min-eig", "lk_min_eig_threshold", float),
    ("lk-seed-skip-levels", "lk_seed_skip_levels", int),
    ("lk-skip-mode", "lk_skip_mode", str),          # fixed | adaptive
    ("lk-fast-skip-levels", "lk_fast_skip_levels", int),
    ("lk-probe-px", "lk_probe_px", float),
    ("lk-probe-frac", "lk_probe_disagree_frac", float),
    ("circle-threshold", "circle_threshold", float),
    ("ransac-iters", "ransac_iterations", int),
    ("ransac-reproj", "ransac_reproj_threshold", float),
    ("ransac-confidence", "ransac_confidence", float),
    ("max-rotation", "max_rotation_rad", float),
    ("min-scale", "min_scale", float),
    ("max-scale", "max_scale", float),
    ("min-accept-inliers", "min_accept_inliers", int),
    ("lk-backend", "lk_backend", str),
]


def add_config_flags(parser) -> None:
    """Expose every reference algorithm constant as a CLI override."""
    g = parser.add_argument_group(
        "algorithm constants (defaults = reference values)")
    for flag, field, typ in _CONFIG_FLAGS:
        g.add_argument(f"--{flag}", dest=field, type=typ, default=None)
    g.add_argument("--mono-rotation", dest="mono_rotation",
                   action="store_true", default=None,
                   help="rotation from the 8-point essential path "
                        "(reference src/visualOdometry.h:42)")


def config_from_args(args, h: int, w: int):
    from visual_odom_tpu.config import VOConfig

    overrides = {}
    for _, field, _typ in _CONFIG_FLAGS:
        v = getattr(args, field, None)
        if v is not None:
            overrides[field] = v
    if getattr(args, "mono_rotation", None):
        overrides["mono_rotation"] = True
    return VOConfig.for_image(h, w, **overrides)


def _cmd_run(args) -> int:
    from visual_odom_tpu.config import VOConfig, load_calibration
    from visual_odom_tpu.runner.pipeline import run_sequence
    from visual_odom_tpu.eval.kitti_eval import evaluate_sequence
    from visual_odom_tpu.eval.plot import render_trajectory, save_png

    intr = load_calibration(args.calibration)

    if args.sequence == "synthetic":
        from visual_odom_tpu.io.synthetic import SyntheticStereoSequence

        if not intr.height:
            print("synthetic mode needs Camera.width/height in the calib file")
            return 1
        seq = SyntheticStereoSequence(intr, num_frames=args.max_frames or 50)
        frames = iter(seq)
        gt = seq.poses
        h, w = intr.height, intr.width
    elif args.sequence == "rgbd":
        # Live capture path (reference src/main.cpp:58,101-106). Requires
        # camera hardware; fails fast otherwise.
        from visual_odom_tpu.io.camera import V4L2StereoCamera

        cam = V4L2StereoCamera()
        frames = iter(lambda: cam.get_lr_frames(), None)
        gt = None
        # Frame dims come from the calibration file (the reference reads
        # rgbd.yaml's Camera.width/height keys nowhere and hard-codes
        # 640x480, src/rgbd_standalone.cpp:74-76; here the YAML is
        # authoritative, falling back to the reference's constants).
        h = intr.height or 480
        w = intr.width or 640
    else:
        from visual_odom_tpu.io.kitti import KittiSequence, load_poses

        kseq = KittiSequence(args.sequence)
        left0, _ = kseq.frame(0)
        h, w = left0.shape

        # Stream through the native prefetcher when built (decode overlaps
        # device compute); falls back to synchronous reads inside.
        frames = kseq.iter_prefetched(max_frames=args.max_frames)
        gt = load_poses(args.ground_truth) if args.ground_truth else None

    cfg = config_from_args(args, h, w)
    if args.chunk:
        # Chunked-scan fast path (one device dispatch per --chunk frames);
        # with --checkpoint it snapshots at chunk boundaries and resumes
        # (runner.run_sequence_scan_resumable). Per-frame host features
        # (metrics JSONL, track overlays, BA track collection) need the
        # interactive runner.
        if args.tracks_dir or args.metrics:
            print("--chunk is the no-host-sync fast path; it cannot emit "
                  "per-frame metrics/tracks — drop --chunk or those flags")
            return 1
        from visual_odom_tpu.io.kitti import save_poses_kitti
        from visual_odom_tpu.runner.pipeline import (
            run_sequence_scan,
            run_sequence_scan_resumable,
        )

        collect = bool(args.ba_window)
        snaps = None
        if args.checkpoint:
            seq_obj = locals().get("kseq") or locals().get("seq")
            if seq_obj is None or not hasattr(seq_obj, "frame"):
                print("--checkpoint needs a random-access sequence "
                      "(KITTI dir or synthetic)")
                return 1
            out = run_sequence_scan_resumable(
                seq_obj, cfg, intr,
                checkpoint_path=args.checkpoint,
                checkpoint_every=args.checkpoint_every,
                chunk=args.chunk,
                max_frames=args.max_frames,
                verbose=not args.quiet,
                upload_threads=args.upload_threads,
                collect_tracks=collect,
            )
        else:
            out = run_sequence_scan(
                frames, cfg, intr, chunk=args.chunk,
                collect_tracks=collect,
                upload_threads=args.upload_threads)
        if collect:
            poses, fetched, wall, processed, snaps = out
        else:
            poses, fetched, wall, processed = out
        if args.ba_window:
            # Scan-speed BA: the scan emits compact per-frame TrackSnapshots
            # as extra ys (make_scan_step_fn with_tracks, checkpointed as
            # trk_* keys on the resumable path), so windowed-BA smoothing
            # no longer needs the ~10x slower interactive runner
            # (VERDICT r4 weak #4).
            from visual_odom_tpu.ba.window import smooth_trajectory_ba

            solver = None
            if args.ba_ring:
                import jax

                from visual_odom_tpu.parallel.mesh import make_mesh
                from visual_odom_tpu.parallel.ring_ba import (
                    make_ring_window_solver,
                )

                avail = len(jax.devices())
                n_dev = min(args.ba_ring, avail) if args.ba_ring > 0 else avail
                mesh = make_mesh({"seq": n_dev})
                solver = make_ring_window_solver(mesh)
            poses = smooth_trajectory_ba(snaps, poses[: len(snaps) + 1],
                                         intr, window=args.ba_window,
                                         solver=solver,
                                         max_landmarks=args.ba_landmarks,
                                         min_track_len=args.ba_min_track_len,
                                         huber_delta=args.ba_huber)
        if not args.quiet and processed:
            print(f"{processed} frames in {wall:.2f}s "
                  f"({processed / wall:.1f} FPS)")
        if args.loop_close:
            poses = _apply_loop_close(args, poses, locals().get("kseq")
                                      or locals().get("seq"), cfg, intr)
        if args.output:
            save_poses_kitti(args.output, poses)
        if args.trajectory_png:
            save_png(args.trajectory_png, render_trajectory(poses, gt))
        if gt is not None:
            n = min(len(gt), len(poses))
            print(json.dumps(evaluate_sequence(np.asarray(gt)[:n],
                                               poses[:n]), indent=2))
        return 0
    if args.checkpoint:
        from visual_odom_tpu.runner.pipeline import run_sequence_resumable

        seq_obj = locals().get("kseq") or locals().get("seq")
        if seq_obj is None or not hasattr(seq_obj, "frame"):
            print("--checkpoint needs a random-access sequence "
                  "(KITTI dir or synthetic)")
            return 1
        poses, results = run_sequence_resumable(
            seq_obj,
            cfg,
            intr,
            checkpoint_path=args.checkpoint,
            checkpoint_every=args.checkpoint_every,
            max_frames=args.max_frames,
            metrics_path=args.metrics,
            poses_path=args.output,
            verbose=not args.quiet,
        )
    else:
        live = None
        if args.live:
            from visual_odom_tpu.eval.plot import LiveDisplay

            try:
                live = LiveDisplay(poses_gt=gt)
            except RuntimeError as e:
                print(e)
                return 1
        out = run_sequence(
            frames,
            cfg,
            intr,
            metrics_path=args.metrics,
            poses_path=args.output,
            verbose=not args.quiet,
            tracks_dir=args.tracks_dir,
            tracks_every=args.tracks_every,
            collect_tracks=bool(args.ba_window),
            live=live,
        )
        if args.ba_window:
            from visual_odom_tpu.ba.window import smooth_trajectory_ba
            from visual_odom_tpu.io.kitti import save_poses_kitti

            poses, results, snaps = out
            solver = None
            if args.ba_ring:
                # Sequence-parallel ring solver over every available device
                # (exact: auto-halo from observed track spans, unsharded
                # fallback when the mesh can't afford the halo).
                import jax

                from visual_odom_tpu.parallel.mesh import make_mesh
                from visual_odom_tpu.parallel.ring_ba import (
                    make_ring_window_solver,
                )

                avail = len(jax.devices())
                n_dev = min(args.ba_ring, avail) if args.ba_ring > 0 else avail
                mesh = make_mesh({"seq": n_dev})
                solver = make_ring_window_solver(mesh)
            poses = smooth_trajectory_ba(snaps, poses, intr,
                                         window=args.ba_window,
                                         solver=solver,
                                         max_landmarks=args.ba_landmarks,
                                         min_track_len=args.ba_min_track_len,
                                         huber_delta=args.ba_huber)
            if args.output:
                save_poses_kitti(args.output, poses)
        else:
            poses, results = out

    if args.loop_close:
        poses = _apply_loop_close(args, poses, locals().get("kseq")
                                  or locals().get("seq"), cfg, intr)
    if args.trajectory_png:
        save_png(args.trajectory_png, render_trajectory(poses, gt))
    if gt is not None:
        score = evaluate_sequence(np.asarray(gt), poses)
        print(json.dumps(score, indent=2))
    return 0


def _apply_loop_close(args, poses, seq_obj, cfg, intr):
    """Pose-graph loop closure over a finished run (vo run --loop-close):
    needs random-access frames to measure the loop edges."""
    from visual_odom_tpu.runner.loopclosure import close_loops

    if seq_obj is None or not hasattr(seq_obj, "frame"):
        print("--loop-close needs a random-access sequence "
              "(KITTI dir or synthetic); skipping")
        return poses
    new_poses, info = close_loops(np.asarray(poses), seq_obj.frame, cfg,
                                  intr)
    if not args.quiet:
        print(f"loop closure: {len(info.candidates)} candidates, "
              f"{len(info.edges)} edges accepted "
              f"{[(a, b) for (a, b, _) in info.edges]}")
    if args.output and info.edges:
        from visual_odom_tpu.io.kitti import save_poses_kitti

        save_poses_kitti(args.output, new_poses)
    return new_poses if info.edges else poses


def _cmd_eval(args) -> int:
    from visual_odom_tpu.io.kitti import load_poses
    from visual_odom_tpu.eval.kitti_eval import (
        calc_sequence_errors,
        evaluate_sequence,
    )

    gt = load_poses(args.gt)
    res = load_poses(args.result)
    if len(gt) != len(res) and not args.allow_partial:
        print(f"pose count mismatch: gt={len(gt)} result={len(res)} "
              "(pass --allow-partial to score the overlap)")
        return 2
    n = min(len(gt), len(res))
    score = evaluate_sequence(gt[:n], res[:n])
    print(json.dumps(score, indent=2))
    if args.errors_out:
        from visual_odom_tpu.eval.devkit import save_sequence_errors

        save_sequence_errors(calc_sequence_errors(gt[:n], res[:n]),
                             args.errors_out)
    if args.artifacts_dir:
        from visual_odom_tpu.eval.devkit import eval_sequence_artifacts

        eval_sequence_artifacts(gt[:n], res[:n], args.artifacts_dir,
                                seq_name=args.seq_name)
    return 0


def _cmd_eval_all(args) -> int:
    from visual_odom_tpu.eval.devkit import eval_all
    from visual_odom_tpu.utils.notify import Notifier

    results = eval_all(
        args.gt_dir, args.result_dir, args.out_dir,
        sequences=args.sequences or None,
        notifier=Notifier(email=args.email or ""),
        plots=not args.no_plots,
    )
    with open(f"{args.out_dir}/summary.json", "w") as f:
        json.dump(results, f, indent=2)
    return 0 if results else 1


def _cmd_run_batch(args) -> int:
    """Data-parallel lockstep run of several sequences over a device mesh
    (BASELINE.json eval config 5)."""
    import os

    from visual_odom_tpu.config import VOConfig, load_calibration
    from visual_odom_tpu.eval.kitti_eval import evaluate_sequence
    from visual_odom_tpu.io.kitti import (
        KittiSequence,
        load_poses,
        save_poses_kitti,
    )
    from visual_odom_tpu.parallel.batch_eval import run_sequences_batched
    from visual_odom_tpu.parallel.mesh import data_model_mesh

    class _Limited:
        """Random-access max-frames view (keeps streaming lazy)."""

        def __init__(self, seq, n):
            self._seq = seq
            self._n = min(len(seq), n) if n else len(seq)

        def __len__(self):
            return self._n

        def frame(self, i):
            return self._seq.frame(i)

    intr = load_calibration(args.calibration)
    seqs, names = [], []
    for d in args.sequences:
        # Sequences stream frame-by-frame through the batched runner's
        # prefetcher — a full KITTI sequence is several GB decoded and must
        # never materialize in RAM.
        seqs.append(_Limited(KittiSequence(d), args.max_frames))
        names.append(os.path.basename(os.path.normpath(d)))
    h, w = seqs[0].frame(0)[0].shape
    cfg = config_from_args(args, h, w)
    mesh = data_model_mesh(data=args.data_parallel or None)
    poses_list, stats, wall = run_sequences_batched(
        seqs, cfg, intr, mesh, chunk=args.chunk,
        checkpoint_path=args.checkpoint or "",
        checkpoint_every=args.checkpoint_every)
    total_frames = sum(len(s) for s in seqs)
    print(f"{total_frames} frames / {len(seqs)} sequences in {wall:.1f}s "
          f"({total_frames / wall:.1f} frames/s aggregate)")
    os.makedirs(args.out_dir, exist_ok=True)
    summary = {}
    for name, poses in zip(names, poses_list):
        save_poses_kitti(os.path.join(args.out_dir, f"{name}.txt"), poses)
        if args.gt_dir:
            gt_path = os.path.join(args.gt_dir, f"{name}.txt")
            if os.path.exists(gt_path):
                gt = load_poses(gt_path)
                n = min(len(gt), len(poses))
                summary[name] = evaluate_sequence(gt[:n], poses[:n])
    if summary:
        print(json.dumps(summary, indent=2))
    return 0


def _cmd_bench(args) -> int:
    import subprocess

    cmd = [sys.executable, "bench.py"]
    if args.quick:
        cmd.append("--quick")
    if args.frames:
        cmd += ["--frames", str(args.frames)]
    if args.height:
        cmd += ["--height", str(args.height)]
    if args.width:
        cmd += ["--width", str(args.width)]
    return subprocess.call(cmd)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="vo", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("run", help="run visual odometry over a sequence")
    pr.add_argument("sequence", help="KITTI sequence dir, 'synthetic', or 'rgbd'")
    pr.add_argument("calibration", help="OpenCV-YAML calibration file")
    pr.add_argument("ground_truth", nargs="?", help="KITTI GT pose file")
    pr.add_argument("--output", "-o", help="write KITTI-format poses here")
    pr.add_argument("--metrics", help="write JSONL per-frame metrics here")
    pr.add_argument("--trajectory-png", help="write bird's-eye trajectory PNG")
    pr.add_argument("--max-frames", type=int, default=0)
    pr.add_argument("--chunk", type=int, default=0,
                    help="frames per device dispatch (0 = interactive "
                         "per-frame runner; > 0 = chunked-scan fast path)")
    pr.add_argument("--checkpoint",
                    help="checkpoint file; resumes from it when present "
                         "(with --chunk: chunk-boundary snapshots on the "
                         "fast path)")
    pr.add_argument("--checkpoint-every", type=int, default=100,
                    help="snapshot interval in frames (rounded up to a "
                         "chunk multiple on the fast path)")
    pr.add_argument("--upload-threads", type=int, default=4,
                    help="concurrent decode+upload streams feeding the "
                         "fast path (UPLOAD_SWEEP_r05: 4 streams lift the "
                         "tunnel-bound streamed rate ~35%% over 1)")
    pr.add_argument("--live", action="store_true",
                    help="interactive trajectory + tracking windows "
                         "(needs a display server; reference "
                         "src/utils.cpp:19-48 imshow behavior)")
    pr.add_argument("--tracks-dir",
                    help="write displayTracking-style overlay PNGs here")
    pr.add_argument("--tracks-every", type=int, default=50)
    pr.add_argument("--ba-window", type=int, default=0,
                    help="smooth the trajectory with windowed bundle "
                         "adjustment over N-frame windows (0 = off; "
                         "short courses: 8; km-scale: 16 with "
                         "--ba-min-track-len 4 --ba-huber 1.0 — "
                         "SOAK_r05.json ba_tune_rows)")
    pr.add_argument("--ba-landmarks", type=int, default=256,
                    help="landmark capacity per BA window")
    pr.add_argument("--ba-min-track-len", type=int, default=3,
                    help="min frames a track must span to enter BA")
    pr.add_argument("--ba-huber", type=float, default=1.5,
                    help="Huber delta (px) for the BA robust loss")
    pr.add_argument("--ba-ring", type=int, nargs="?", const=-1, default=0,
                    help="shard each BA window's solve over a device ring "
                         "(optionally: number of devices; default all). "
                         "Exact — auto-halo with unsharded fallback.")
    pr.add_argument("--loop-close", action="store_true",
                    help="after the run: detect revisits in the estimate, "
                         "measure loop edges with real VO steps, solve the "
                         "keyframe pose graph and redistribute the drift "
                         "(runner/loopclosure.py; needs random-access "
                         "frames)")
    pr.add_argument("--quiet", action="store_true")
    add_config_flags(pr)
    pr.set_defaults(fn=_cmd_run)

    prb = sub.add_parser(
        "run-batch",
        help="run several sequences in lockstep over a device mesh (DP)")
    prb.add_argument("sequences", nargs="+", help="KITTI sequence dirs")
    prb.add_argument("--calibration", required=True)
    prb.add_argument("--out-dir", required=True)
    prb.add_argument("--gt-dir", help="score each sequence against GT here")
    prb.add_argument("--data-parallel", type=int, default=0,
                     help="data-axis size (default: all devices)")
    prb.add_argument("--max-frames", type=int, default=0)
    prb.add_argument("--chunk", type=int, default=16,
                     help="frames per device dispatch (0 = step per frame)")
    prb.add_argument("--checkpoint",
                     help="restartable batch eval: one atomic snapshot "
                          "covering all lockstep shards, chunk-boundary "
                          "aligned; resumes from it when present")
    prb.add_argument("--checkpoint-every", type=int, default=256,
                     help="batched snapshot interval in frames (rounded "
                          "up to a chunk multiple)")
    add_config_flags(prb)
    prb.set_defaults(fn=_cmd_run_batch)

    pe = sub.add_parser("eval", help="KITTI devkit scoring")
    pe.add_argument("--gt", required=True)
    pe.add_argument("--result", required=True)
    pe.add_argument("--errors-out", help="devkit-format per-segment errors")
    pe.add_argument("--artifacts-dir",
                    help="write full devkit artifacts (errors/plots/stats)")
    pe.add_argument("--seq-name", default="00",
                    help="sequence name for artifact files")
    pe.add_argument("--allow-partial", action="store_true")
    pe.set_defaults(fn=_cmd_eval)

    pa = sub.add_parser(
        "eval-all",
        help="devkit eval() over a results directory (seqs scored vs GT)")
    pa.add_argument("--gt-dir", required=True)
    pa.add_argument("--result-dir", required=True)
    pa.add_argument("--out-dir", required=True)
    pa.add_argument("--sequences", nargs="*",
                    help="sequence names (default: every <seq>.txt found)")
    pa.add_argument("--email", help="notify via sendmail when available")
    pa.add_argument("--no-plots", action="store_true")
    pa.set_defaults(fn=_cmd_eval_all)

    pb = sub.add_parser("bench", help="run the benchmark harness")
    pb.add_argument("--quick", action="store_true")
    pb.add_argument("--frames", type=int, default=0)
    pb.add_argument("--height", type=int, default=0)
    pb.add_argument("--width", type=int, default=0)
    pb.set_defaults(fn=_cmd_bench)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
