#!/usr/bin/env python3
"""CPU burner PACK for bench weather drills.

Usage: python3 tools/burnpack.py [n_spinners] [duration_sec] [n_packs]

Spawns n_packs process groups of n_spinners CPU-bound children each.
multiprocessing children share the parent's scheduler autogroup, so ONE
pack weighs like one foreground job against the bench JVM (~2x
contention on a saturated box); setsid-per-spinner drills give every
spinner its own autogroup and starve the JVM N-fold (the r15 lesson:
a "64-burner" setsid drill measured 36x). Each pack is its own
autogroup via setsid, so n_packs tunes the contention factor:
1 pack = ~2x, 2 packs = ~3x against a single JVM.

Children self-terminate at the wall-clock deadline, so a killed parent
leaves no immortal orphans (the r16 drill-hygiene lesson) - but still
pkill -f burnpack and wait for load decay before trusting a later
"quiet" run.
"""
import multiprocessing
import os
import sys
import time


def spin(stop_t: float) -> None:
    x = 0
    while time.time() < stop_t:
        for i in range(20000):
            x += i * i


def pack(n: int, stop_t: float) -> None:
    os.setsid()  # one autogroup per pack
    ps = [multiprocessing.Process(target=spin, args=(stop_t,))
          for _ in range(n)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    dur = float(sys.argv[2]) if len(sys.argv) > 2 else 420.0
    n_packs = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    stop_t = time.time() + dur
    packs = [multiprocessing.Process(target=pack, args=(n, stop_t))
             for _ in range(n_packs)]
    for p in packs:
        p.start()
    print(f"[burnpack] {n_packs} pack(s) x {n} spinners for {dur:.0f}s",
          flush=True)
    for p in packs:
        p.join()


if __name__ == "__main__":
    main()
