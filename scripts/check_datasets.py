#!/usr/bin/env python
"""Validate a TUM / EuRoC dataset directory and print the exact command
that measures the north-star ATE metric (BASELINE.json: ATE RMSE on TUM
fr1/xyz + EuRoC MH_01; the reference's validation is entirely
dataset-driven, /root/reference/README.md:47-58).

This host has no network egress, so sequences cannot be downloaded here;
the regression tests (tests/test_tum_regression.py,
tests/test_euroc_regression.py) activate the moment a real sequence lands
on disk. This script checks a candidate directory's layout so that, when
one does, the measurement is one command away:

    python scripts/check_datasets.py /path/to/rgbd_dataset_freiburg1_xyz
    python scripts/check_datasets.py /path/to/MH_01_easy
    python scripts/check_datasets.py --self-test   # synthesizes both
                                                   # layouts and validates

Layout checked for TUM RGB-D (vision.in.tum.de/data/datasets/rgbd-dataset):
    rgb.txt  depth.txt  groundtruth.txt  rgb/*.png  depth/*.png
Layout checked for EuRoC ASL (projects.asl.ethz.ch — MAV datasets):
    mav0/cam0/data.csv  mav0/cam0/data/*.png  mav0/imu0/data.csv
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _fail(msg):
    print(f"  FAIL: {msg}")
    return False


def check_tum(root: str) -> bool:
    """Validate a TUM RGB-D sequence directory; True if usable."""
    print(f"checking TUM RGB-D layout at {root}")
    ok = True
    for name in ("rgb.txt", "depth.txt", "groundtruth.txt"):
        p = os.path.join(root, name)
        if not os.path.isfile(p):
            ok = _fail(f"missing {name}")
    if not ok:
        return False
    from sdslam_tpu.io.datasets import associate, read_tum_list

    rgb = read_tum_list(os.path.join(root, "rgb.txt"))
    depth = read_tum_list(os.path.join(root, "depth.txt"))
    if not rgb or not depth:
        return _fail("rgb.txt / depth.txt list no frames")
    pairs = associate(rgb, depth)
    if len(pairs) < 10:
        return _fail(f"only {len(pairs)} rgb/depth associations")
    # spot-check that the referenced files exist and decode
    for ts, rel in (rgb[0], rgb[len(rgb) // 2], depth[0]):
        p = os.path.join(root, rel)
        if not os.path.isfile(p):
            return _fail(f"listed file missing: {rel}")
    from PIL import Image

    img = Image.open(os.path.join(root, rgb[0][1]))
    dep = Image.open(os.path.join(root, depth[0][1]))
    if img.size[0] < 64 or img.size[1] < 48:
        return _fail(f"rgb image suspiciously small: {img.size}")
    if dep.mode not in ("I;16", "I", "I;16B"):
        return _fail(f"depth PNG mode {dep.mode!r}, expected 16-bit "
                     "(TUM 5000-counts-per-meter convention)")
    gt = sum(
        1
        for line in open(os.path.join(root, "groundtruth.txt"))
        if line.strip() and not line.startswith("#")
    )
    if gt < 10:
        return _fail(f"groundtruth.txt has only {gt} rows")
    print(f"  OK: {len(rgb)} rgb frames, {len(pairs)} associated pairs, "
          f"{gt} groundtruth rows, {img.size[0]}x{img.size[1]}")
    print("  run the north-star regression with:")
    print(f"    SDSLAM_TUM_ROOT={root} python -m pytest "
          "tests/test_tum_regression.py -q -s")
    return True


def check_euroc(root: str) -> bool:
    """Validate a EuRoC ASL sequence directory; True if usable."""
    print(f"checking EuRoC ASL layout at {root}")
    cam_csv = os.path.join(root, "mav0", "cam0", "data.csv")
    imu_csv = os.path.join(root, "mav0", "imu0", "data.csv")
    for p in (cam_csv, imu_csv):
        if not os.path.isfile(p):
            return _fail(f"missing {os.path.relpath(p, root)}")
    from sdslam_tpu.io.datasets import EuRoCDataset

    ds = EuRoCDataset(root)
    if len(ds) < 10:
        return _fail(f"only {len(ds)} camera frames listed")
    ts0, img = ds.frame(0)
    rows = ds.imu_between(ts0, ts0 + 0.5)
    if img.ndim != 2:
        return _fail("cam0 image did not decode to grayscale")
    if not rows:
        return _fail("no IMU rows within 0.5 s of the first frame")
    print(f"  OK: {len(ds)} frames ({img.shape[1]}x{img.shape[0]}), "
          f"{len(rows)} IMU rows in the first 0.5 s")
    print("  run the north-star regression with:")
    print(f"    SDSLAM_EUROC_ROOT={root} python -m pytest "
          "tests/test_euroc_regression.py -q -s")
    return True


def check(root: str) -> bool:
    """Auto-detect the layout kind and validate."""
    if os.path.isdir(os.path.join(root, "mav0")):
        return check_euroc(root)
    return check_tum(root)


def self_test(tmpdir: str) -> bool:
    """Synthesize both layouts with the renderer the disk-e2e tests use
    and validate them — proves this checker accepts exactly what the
    pipeline consumes."""
    import numpy as np

    from sdslam_tpu.geometry.camera import CameraModel
    from sdslam_tpu.io.datasets import write_euroc_sequence, write_tum_sequence
    from sdslam_tpu.io.synthetic import SyntheticSequence

    cam = CameraModel(fx=160.0, fy=160.0, cx=79.5, cy=59.5,
                      width=160, height=120, bf=16.0)
    n = 12
    seq = SyntheticSequence(cam, n_frames=n, trajectory="orbit",
                            radius=0.05, yaw_amp=0.03)
    tum_root = os.path.join(tmpdir, "tum_synth")
    write_tum_sequence(
        tum_root,
        ((1.7e9 + i / 30.0,) + tuple(np.asarray(a) for a in seq.frame(i)[1:])
         for i in range(n)),
        np.asarray(seq.poses),
    )
    euroc_root = os.path.join(tmpdir, "euroc_synth")
    write_euroc_sequence(
        euroc_root,
        ((1.7e9 + i / 30.0, np.asarray(seq.frame(i)[1])) for i in range(n)),
        imu_rows=[(1.7e9 + i / 200.0, [0, 0, 0, 0, 0, 9.81])
                  for i in range(n * 7)],
    )
    ok = check(tum_root) and check(euroc_root)
    print("self-test", "OK" if ok else "FAILED")
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("root", nargs="*", help="dataset directories to check")
    ap.add_argument("--self-test", action="store_true",
                    help="synthesize both layouts and validate them")
    args = ap.parse_args(argv)
    if not args.root and not args.self_test:
        ap.error("give a dataset directory or --self-test")
    ok = True
    if args.self_test:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            ok = self_test(td) and ok
    for root in args.root:
        ok = check(root) and ok
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
