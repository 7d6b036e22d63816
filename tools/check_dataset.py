"""Dataset sanity scan (reference check_metrics.py / check_mode.py analogs,
environments/dataset/data/*/check_metrics.py).

  python tools/check_dataset.py --task pushing

Reports, per generated dataset: episode counts and length distribution,
per-dim action magnitudes, NaN/inf screening over every stored array, the
train/eval split integrity, and the demo mode distribution (the prior the
KL metrics score against).
"""
from __future__ import annotations

import argparse
import collections
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _walk_arrays(d, prefix=""):
    for k, v in d.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _walk_arrays(v, name + ".")
        else:
            arr = np.asarray(v)
            if arr.dtype.kind in "fiu":
                yield name, arr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", required=True)
    ap.add_argument("--data", default="data")
    args = ap.parse_args()

    task_dir = os.path.join(args.data, args.task)
    all_dir = os.path.join(task_dir, "all_data")
    with open(os.path.join(task_dir, "train_files.pkl"), "rb") as f:
        train_files = pickle.load(f)
    with open(os.path.join(task_dir, "eval_files.pkl"), "rb") as f:
        eval_files = pickle.load(f)
    on_disk = set(os.listdir(all_dir))
    missing = [f for f in train_files + eval_files if f not in on_disk]
    overlap = set(train_files) & set(eval_files)
    print(f"{args.task}: {len(train_files)} train + {len(eval_files)} eval "
          f"episodes, {len(on_disk)} files on disk")
    if missing:
        print(f"  MISSING from disk: {missing[:5]}{'...' if len(missing) > 5 else ''}")
    if overlap:
        print(f"  TRAIN/EVAL OVERLAP: {sorted(overlap)[:5]}")

    lengths, modes = [], collections.Counter()
    bad_nan, stat = [], collections.defaultdict(list)
    for fn in train_files + eval_files:
        with open(os.path.join(all_dir, fn), "rb") as f:
            ep = pickle.load(f)
        mode = ep.get("mode")
        if mode is not None:
            modes[tuple(np.atleast_1d(np.asarray(mode)).tolist())] += 1
        T = None
        for name, arr in _walk_arrays(ep):
            if name.startswith("robot."):
                T = len(arr) if T is None else T
            if not np.isfinite(arr).all():
                bad_nan.append((fn, name))
            stat[name].append((np.abs(arr).max(), arr.shape))
        lengths.append(T or 0)

    lengths = np.asarray(lengths)
    print(f"  episode length: min {lengths.min()} median "
          f"{int(np.median(lengths))} max {lengths.max()}")
    if bad_nan:
        print(f"  NON-FINITE values in {len(bad_nan)} arrays, e.g. {bad_nan[:3]}")
    else:
        print("  all arrays finite")
    for name, vals in sorted(stat.items()):
        mx = max(v[0] for v in vals)
        print(f"  {name}: shape {vals[0][1]} max|.| {mx:.4g}")
    total = sum(modes.values())
    print("  mode distribution (KL prior source):")
    for m, c in sorted(modes.items()):
        print(f"    {m}: {c} ({c / total:.3f})")


if __name__ == "__main__":
    main()
