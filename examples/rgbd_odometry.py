#!/usr/bin/env python3
"""RGB-D odometry/SLAM driver — the ``rgbd_tum_noros`` equivalent (L4).

Usage (TUM layout, mirroring the reference CLI
``./rgbd_tum_noros voc settings seq assoc`` — no vocabulary file is needed
here; settings may be a reference-format camera YAML):

    python examples/rgbd_odometry.py --sequence /data/rgbd_dataset_fr3_walking_xyz \
        [--settings TUM3.yaml] [--assoc associations.txt] [--out traj.txt] \
        [--dyna] [--frames N]

or on the built-in synthetic scene (no dataset required):

    python examples/rgbd_odometry.py --synthetic --frames 12 --out traj.txt
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# allow running the script directly from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sequence", help="TUM sequence directory")
    ap.add_argument("--assoc", help="pre-built association file (optional)")
    ap.add_argument("--settings", help="reference-format camera YAML")
    ap.add_argument("--synthetic", action="store_true", help="use built-in synthetic scene")
    ap.add_argument("--frames", type=int, default=0, help="limit frame count")
    ap.add_argument("--out", default="CameraTrajectory.txt")
    ap.add_argument("--dyna", action="store_true",
                    help="enable dynamic-region detection (DynaDetect)")
    ap.add_argument("--slam", action="store_true",
                    help="full SLAM (keyframes + local BA) instead of odometry")
    ap.add_argument("--map", dest="map_out",
                    help="build a dense voxel map and save it to this .pcd")
    ap.add_argument("--fused", action="store_true",
                    help="with --dyna: use the single-dispatch fused front-end "
                         "(flow+cluster+mask+ORB in one XLA graph)")
    ap.add_argument("--n-features", type=int, default=1000)
    ap.add_argument("--eval-ate", action="store_true",
                    help="evaluate ATE against ground truth when available")
    ap.add_argument("--timing", action="store_true",
                    help="print per-stage timing means at exit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: TPU compiles go through a remote service and
    # can take minutes; cache them across runs
    from sindslam_tpu.utils import setup_compilation_cache
    setup_compilation_cache()

    from sindslam_tpu.config import ORBConfig, SystemConfig, system_config_from_yaml
    from sindslam_tpu.datasets.tum import write_tum_trajectory
    from sindslam_tpu.frontend import orb
    from sindslam_tpu.ops import image as im
    from sindslam_tpu.slam.frame import build_frame
    from sindslam_tpu.slam.tracking import OdometryTracker

    if args.settings:
        cfg = system_config_from_yaml(args.settings)
    else:
        cfg = SystemConfig()
    ocfg = ORBConfig(n_features=args.n_features,
                     n_levels=cfg.orb.n_levels,
                     ini_th_fast=cfg.orb.ini_th_fast,
                     min_th_fast=cfg.orb.min_th_fast)
    cam = cfg.camera

    # ---- frame source
    gt_rows = None
    if args.synthetic:
        from sindslam_tpu.datasets.synthetic import generate_sequence

        n = args.frames or 12
        seq = list(generate_sequence(n_frames=n, seed=0, amplitude=0.06))
        frames_iter = [(rgb, depth, t) for rgb, depth, _, _, t in seq]
        gt_rows = [(t, pose) for _, _, _, pose, t in seq]
    else:
        if not args.sequence:
            ap.error("--sequence or --synthetic required")
        from sindslam_tpu.datasets.tum import load_tum_sequence

        seq = load_tum_sequence(args.sequence, cfg.associate_offset,
                                cfg.associate_max_difference,
                                cam.depth_factor, args.assoc)
        n = min(len(seq), args.frames) if args.frames else len(seq)
        frames_iter = (seq.load_frame(i) for i in range(n))

    # ---- optional dynamic-region detector
    dyna = None
    fused_state = None
    if args.dyna and args.fused:
        from sindslam_tpu.frontend.pipeline import frontend_step, init_state
    elif args.dyna:
        from sindslam_tpu.frontend.dyna_detect import DynaDetector

        dyna = DynaDetector(cfg)

    if args.slam:
        from sindslam_tpu.slam.system import SlamSystem

        slam = SlamSystem(cfg)
    else:
        slam = None
    mapper = None
    if args.map_out:
        from sindslam_tpu.mapping.dense import DenseMapper

        mapper = DenseMapper(cam, cfg.mapping)
    tracker = OdometryTracker(cam, cfg.tracking)
    zero_mask = jnp.zeros((cam.height, cam.width), jnp.int32)

    from sindslam_tpu.utils.profiling import StageTimer

    timer = StageTimer()
    timestamps, poses_twc = [], []
    t_total = t_detect = t_track = 0.0
    n_done = 0

    if args.dyna and args.fused and slam is not None:
        # ---- single-dispatch pipeline (r4): dynamic-region detection,
        # masked ORB, matching and pose optimization run as ONE jitted
        # graph per frame (SlamSystem.track_fused) — each extra dispatch
        # costs a full tunnel RPC round trip, so the r3 two-dispatch
        # prefetch dance is gone. The track readback is deferred one frame
        # (tracking-thread-publishes-while-bookkeeping-lags, reference-
        # style): per-frame Tcw below is the motion-model prediction; the
        # saved trajectory comes from slam.trajectory(), which replays the
        # exact integrated poses.
        slam.deferred_track = True
        for rgb, depth, ts in frames_iter:
            t0 = time.time()
            rgb_j = jnp.asarray(rgb)
            d = jnp.asarray(depth)
            with timer.stage("frontend+track (one dispatch)"):
                Tcw, is_kf, out = slam.track_fused(rgb_j, d, ts)
            info = {"n_matches": -1, "n_inliers": -1, "kf": is_kf}
            if mapper is not None and \
                    n_done % cfg.mapping.keyframe_decimation == 0:
                mapper.insert_keyframe(rgb_j, d, out.dyna_mask,
                                       out.label_img, Tcw)
            t_total += time.time() - t0
            t_track += time.time() - t0
            timestamps.append(ts)
            poses_twc.append(np.linalg.inv(Tcw))
            n_done += 1
            if n_done % 10 == 0 or slam.lost:
                state = "LOST" if slam.lost else "ok"
                print(f"[{n_done}] t={ts:.3f} {state} {info}", flush=True)
        frames_iter = []             # the generic loop below is skipped

    for rgb, depth, ts in frames_iter:
        t0 = time.time()
        g = im.rgb_to_gray(jnp.asarray(rgb))
        d = jnp.asarray(depth)
        if args.dyna and args.fused:
            if fused_state is None:
                fused_state = init_state(cfg, g)
            with timer.stage("frontend(fused)"):
                out, fused_state = frontend_step(jnp.asarray(rgb), d, fused_state, cfg)
            mask, label, feats = out.dyna_mask, out.label_img, out.features
            fused_out = out
            t1 = time.time()
            t_detect += t1 - t0
        elif dyna is not None:
            with timer.stage("dyna_detect"):
                mask, label = dyna.detect(jnp.asarray(rgb), d)
            t1 = time.time()
            t_detect += t1 - t0
            with timer.stage("orb"):
                feats = orb.extract_orb(g, mask, ocfg,
                                        height=cam.height, width=cam.width)
        else:
            mask = zero_mask
            t1 = t0
            with timer.stage("orb"):
                feats = orb.extract_orb(g, mask, ocfg,
                                        height=cam.height, width=cam.width)
        if args.dyna and args.fused:
            from sindslam_tpu.slam.frame import frame_from_frontend

            frame = frame_from_frontend(fused_out, ts)  # no extra dispatch
        else:
            frame = build_frame(feats, d, cam, ts)
        with timer.stage("tracking"):
            if slam is not None:
                Tcw, is_kf = slam.track_frame(frame, ts)
                info = {"n_matches": -1, "n_inliers": -1, "kf": is_kf}
            else:
                Tcw, info = tracker.track(frame)
        t_track += time.time() - t1
        if mapper is not None and n_done % cfg.mapping.keyframe_decimation == 0:
            lbl = label if dyna is not None else jnp.zeros_like(mask)
            mapper.insert_keyframe(jnp.asarray(rgb), d, mask, lbl, Tcw)
        t_total += time.time() - t0
        timestamps.append(ts)
        poses_twc.append(np.linalg.inv(Tcw))
        n_done += 1
        lost = slam.lost if slam is not None else tracker.lost
        if n_done % 10 == 0 or lost:
            state = "LOST" if lost else "ok"
            print(f"[{n_done}] t={ts:.3f} {state} {info}", flush=True)

    if slam is not None:
        slam.shutdown()
        slam.save_trajectory_tum(args.out)
        slam.save_keyframe_trajectory_tum(args.out.replace(".txt", "") + "_keyframes.txt")
        ts_arr, poses = slam.trajectory()
        poses_twc = list(poses)
        print(f"keyframes: {len(slam.map.keyframes)}, "
              f"map points: {int(slam.map.valid.sum())}")
    else:
        write_tum_trajectory(args.out, np.array(timestamps), np.stack(poses_twc))
    # In the pipelined (--fused) loop the front-end overlaps tracking by
    # construction, so a detect/track split does not exist — label the
    # combined number honestly instead of reporting detect = 0
    # (ADVICE r2 #5).
    pipelined = args.dyna and args.fused and slam is not None
    if pipelined:
        split = f" (pipelined front-end+track {1000*t_track/n_done:.1f} ms)"
    elif args.dyna:
        split = (f" (detect {1000*t_detect/n_done:.1f} ms, "
                 f"track {1000*t_track/n_done:.1f} ms)")
    else:
        split = ""
    print(f"tracked {n_done} frames | mean/frame: total "
          f"{1000*t_total/n_done:.1f} ms{split} | trajectory -> {args.out}")

    if mapper is not None:
        mapper.save_pcd(args.map_out)
        centers, _ = mapper.export_cloud()
        print(f"dense map: {len(centers)} occupied voxels -> {args.map_out}")
        mapper.close()

    if args.timing:
        print(timer.report())

    if args.eval_ate:
        from sindslam_tpu.evaluation import evaluate_ate

        if args.synthetic and gt_rows is not None:
            ts_arr = np.array([t for t, _ in gt_rows])
            gt_xyz = np.stack([p[:3, 3] for _, p in gt_rows])
            est_xyz = np.stack([p[:3, 3] for p in poses_twc])
            print(evaluate_ate(ts_arr, gt_xyz, np.array(timestamps), est_xyz))
        elif not args.synthetic and seq.gt_timestamps is not None:
            est_xyz = np.stack([p[:3, 3] for p in poses_twc])
            print(evaluate_ate(seq.gt_timestamps, seq.gt_poses[:, :3],
                               np.array(timestamps), est_xyz))
        else:
            print("no ground truth available for ATE")
    return 0


if __name__ == "__main__":
    sys.exit(main())
