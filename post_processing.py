#!/usr/bin/env python3
"""Post-processing driver (reference post_processing/post_processing.py).

buffer -> soft score (+ flow-propagated running averages) -> CRF at the
working resolution -> optional CRF at the original 854x480 resolution
(`--benchmark`). Paths and constants mirror the reference defaults; unlike
the reference they are overridable via CLI flags.
"""

import argparse
import os
import sys


def main(argv):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--path_buffer", default="/tmp/buffer_davis",
                        help="buffer from scripts/generate_buffer_DAVIS2016.sh")
    parser.add_argument("--out_soft_score", default="./soft_davis")
    parser.add_argument("--resized_out", default="./crf_resized_davis")
    parser.add_argument("--original_out", default="./crf_original_davis")
    parser.add_argument("--benchmark", action="store_true",
                        help="also run CRF at the original 854x480 resolution")
    parser.add_argument("--path_img", default="./DAVIS/JPEGImages/480p")
    parser.add_argument("--path_gt", default="./DAVIS/Annotations/480p")
    parser.add_argument("--flow_backend", default="auto",
                        choices=["auto", "pyflow", "farneback", "pwc"],
                        help="flow used for mask propagation; auto prefers "
                             "the native pyflow module when built; pwc runs "
                             "the framework's own flow net on device "
                             "(requires --flow_ckpt)")
    parser.add_argument("--flow_ckpt", default="",
                        help="PWC checkpoint (TF1 or pretrain_flow.py) for "
                             "--flow_backend=pwc")
    parser.add_argument("--pwc_search_range", type=int, default=4,
                        help="cost-volume search range the --flow_ckpt was "
                             "trained with (pretrain_flow.py's "
                             "--pwc_search_range; TF1 checkpoints are 4)")
    parser.add_argument("--sxy", type=float, default=25.0)
    parser.add_argument("--srgb", type=float, default=5.0)
    parser.add_argument("--scomp", type=float, default=5.0)
    parser.add_argument("--gauss_k", type=float, default=0.1)
    parser.add_argument("--discover_sequences", action="store_true",
                        help="derive sequence names/lengths from the buffer "
                             "tree instead of the hardcoded DAVIS val list")
    args = parser.parse_args(argv[1:])

    from unsupervised_detection_tpu.postproc import buffer_to_soft_score, run_crf

    flow_backend = args.flow_backend
    if flow_backend == "auto":
        try:
            from unsupervised_detection_tpu.native import pyflow  # noqa: F401

            flow_backend = "pyflow"
        except Exception:
            flow_backend = "farneback"
    elif flow_backend == "pwc":
        if not args.flow_ckpt:
            raise SystemExit("--flow_backend=pwc requires --flow_ckpt")
        from unsupervised_detection_tpu.postproc.propagate import pwc_flow_fn
        from unsupervised_detection_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        flow_backend = pwc_flow_fn(args.flow_ckpt,
                                   search_range=args.pwc_search_range)
    print("Propagation flow backend: {}".format(
        args.flow_backend if callable(flow_backend) else flow_backend))

    seq_names = seq_num = None
    if args.discover_sequences:
        shift_dir = os.path.join(args.path_buffer, "davis_shift_1")
        seq_names = sorted(os.listdir(shift_dir))
        seq_num = [
            len([f for f in os.listdir(os.path.join(shift_dir, s))
                 if f.endswith(".mat")])
            for s in seq_names
        ]
        print("Discovered sequences:", dict(zip(seq_names, seq_num)))

    os.makedirs(args.out_soft_score, exist_ok=True)
    buffer_to_soft_score(buffer_path=args.path_buffer,
                         out_path=args.out_soft_score,
                         seq_names=seq_names, seq_num=seq_num,
                         flow_fn=flow_backend)

    os.makedirs(args.resized_out, exist_ok=True)
    iou_resized = run_crf(args.out_soft_score, args.sxy, args.srgb,
                          args.scomp, args.gauss_k, out_path=args.resized_out)
    print("iou of the resized version:")
    print(iou_resized)

    if args.benchmark:
        from unsupervised_detection_tpu.postproc.crf import run_crf_original_resolution

        os.makedirs(args.original_out, exist_ok=True)
        iou_original = run_crf_original_resolution(
            args.resized_out, args.path_img, args.path_gt,
            60.0, args.srgb, args.scomp, args.gauss_k, args.original_out,
        )
        print("iou of the original resolution version:")
        print(iou_original)


if __name__ == "__main__":
    main(sys.argv)
