#!/usr/bin/env python3
"""Summarize an adversarial-game experiment log (exp_convergence_v2.py).

Parses the 25-cycle val lines and reports the quantities the round
writeups track: phase-transition cycle (first val with IoU > 0.4 and
mask-cover < 0.12), locked-window statistics (while the lock holds),
destabilization cycle (first post-lock val outside the locked regime),
re-lock attempts, best IoU, last-8 mean, and the lr-decay event if the
EXP_POSTLOCK_LR lever fired.

Usage: python tools/exp_game_stats.py <log.txt> [lock_iou=0.4] [cover=0.12]
"""

import re
import sys

import numpy as np


def parse(path):
    rows = []
    pat = re.compile(r"cycle\s+(\d+)\s+IoU (\d+\.\d+)\s+mask-cover (\d+\.\d+)")
    lock_event = None
    for line in open(path):
        m = pat.search(line)
        if m:
            rows.append((int(m.group(1)), float(m.group(2)),
                         float(m.group(3))))
        if "LOCK detected" in line:
            lock_event = line.strip()
    return rows, lock_event


def main():
    path = sys.argv[1]
    lock_iou = float(sys.argv[2]) if len(sys.argv) > 2 else 0.4
    lock_cover = float(sys.argv[3]) if len(sys.argv) > 3 else 0.12
    rows, lock_event = parse(path)
    if not rows:
        raise SystemExit("no val lines found in " + path)
    cycles = np.array([r[0] for r in rows])
    ious = np.array([r[1] for r in rows])
    covers = np.array([r[2] for r in rows])

    locked = (ious > lock_iou) & (covers < lock_cover)
    print(f"vals: {len(rows)} (cycles {cycles[0]}..{cycles[-1]}); "
          f"best IoU {ious.max():.3f} at cycle {cycles[ious.argmax()]}; "
          f"last-8 mean {ious[-8:].mean():.3f}")
    if lock_event:
        print(lock_event)
    if not locked.any():
        print(f"no lock (no val with IoU > {lock_iou} and cover < "
              f"{lock_cover})")
        return
    t0 = locked.argmax()
    print(f"transition: cycle {cycles[t0]} (IoU {ious[t0]:.3f}, cover "
          f"{covers[t0]:.2f})")
    # Destabilization: first val after transition with cover far outside
    # the locked band (collapse to empty/full) — IoU dips alone don't count.
    post = slice(t0, None)
    destab = None
    for i in range(t0 + 1, len(rows)):
        if covers[i] > 0.5 or covers[i] < 0.005:
            destab = i
            break
    end = destab if destab is not None else len(rows)
    w = slice(t0, end)
    frac = float((ious[w] > 0.5).mean())
    print(f"locked window: cycles {cycles[t0]}..{cycles[end - 1]} "
          f"({end - t0} vals) — IoU mean {ious[w].mean():.3f} / max "
          f"{ious[w].max():.3f}, {100 * frac:.0f}% of vals > 0.5, "
          f"cover mean {covers[w].mean():.3f}")
    if destab is None:
        print("destabilization: NONE — lock held to the end of the run")
    else:
        print(f"destabilization: cycle {cycles[destab]} (cover "
              f"{covers[destab]:.2f}); post-destab IoU mean "
              f"{ious[destab:].mean():.3f} max {ious[destab:].max():.3f}")
        relock = [i for i in range(destab, len(rows)) if locked[i]]
        if relock:
            print(f"re-lock: cycle {cycles[relock[0]]} "
                  f"({len(relock)} locked vals after destabilization)")
        else:
            print("re-lock: none")


if __name__ == "__main__":
    main()
