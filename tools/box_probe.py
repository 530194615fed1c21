#!/usr/bin/env python3
"""Box-capability probe for bench adjudication: CPU parallel scaling and
memory bandwidth. Run before/after a suspicious bench reading and record
both numbers next to it.

Round-10c finding this tool exists for: back-to-back quiet-load benches
read 93.8/93.5 s where the same morning measured 71.3 s at 166 queries;
cheap (cache-resident) queries and a register-only spin probe were
UNCHANGED while every shuffle-/cache-scan-heavy query ran ~2x slow. This
probe showed aggregate copy bandwidth 2.4 GB/s with NO parallel scaling
(single-proc 2.5 GB/s) - host memory-bus contention, invisible to load
average, steal time, and CPU-only probes.
"""
import time
import multiprocessing as mp


def spin(_):
    t0 = time.time()
    x = 0
    while time.time() - t0 < 6:
        x += 1
    return x


def bw(_):
    a = bytearray(256 * 1024 * 1024)
    t0 = time.time()
    for _ in range(4):
        bytes(a)  # 256 MB read + 256 MB write per pass
    return 4 * 2 * 256 / 1024 / (time.time() - t0)  # GB/s


if __name__ == "__main__":
    with mp.Pool(1) as p:
        s1 = p.map(spin, [0])[0]
    with mp.Pool(32) as p:
        sn = sum(p.map(spin, range(32)))
    print("cpu: single %.1f Miter/s, 32-proc scaling %.1fx" % (s1 / 6 / 1e6, sn / s1))
    with mp.Pool(1) as p:
        b1 = p.map(bw, [0])[0]
    with mp.Pool(16) as p:
        bn = sum(p.map(bw, range(16)))
    print("membw: single %.1f GB/s, 16-proc aggregate %.1f GB/s (scaling %.1fx)"
          % (b1, bn, bn / b1))
