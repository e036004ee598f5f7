#!/usr/bin/env python3
"""OS-level host quiet-check for the bench book (SCALE.md "What we measure").

A ~5-second, no-JVM discriminator for the co-tenant LATENCY phase: measures
scheduler wakeup latency directly, below Spark and the JVM, so a session can
poll cheaply and only spend the ~90 s graft.HostProbe (or a 7-min bench)
when the OS already reads quiet. The r14 session measured, INSIDE a latency
phase that inflated the sub-second sf0.1 query inventory ~1.9x while CPU
throughput read ~idle:
    thread ping-pong   ~87 us/round-trip   (healthy ~5-20 us)
    32-thread storm    ~254 ms median      (healthy ~2-10 ms)
    fork+exec          ~4.8 ms each        (healthy ~1-2 ms)
The storm number is the one that tracks Spark tiny-job round-trips (a
32-task stage is exactly a 32-thread wake+join). Bands above are provisional
until a quiet window calibrates them on this host; the phase/idle contrast
is an order of magnitude, so the discrimination works regardless.

Usage: python3 tools/hostcheck.py  ->  one JSON line.
"""
import json
import statistics
import threading
import time


def pingpong_us(n=2000):
    a, b = threading.Event(), threading.Event()

    def other():
        for _ in range(n):
            a.wait()
            a.clear()
            b.set()

    t = threading.Thread(target=other)
    t.start()
    t0 = time.perf_counter()
    for _ in range(n):
        a.set()
        b.wait()
        b.clear()
    dt = (time.perf_counter() - t0) / n * 1e6
    t.join()
    return dt


def storm_ms(rounds=30):
    times = []
    for _ in range(rounds):
        barrier = threading.Barrier(33)
        ts = [threading.Thread(target=barrier.wait) for _ in range(32)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        barrier.wait()
        for t in ts:
            t.join()
        times.append((time.perf_counter() - t0) * 1e3)
    return statistics.median(times)


def main():
    storm = storm_ms()
    ping = pingpong_us()
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    print(json.dumps({
        "metric": "hostcheck",
        "storm_32thread_median_ms": round(storm, 2),
        "pingpong_us": round(ping, 1),
        "load_1m": load1,
        "healthy_storm_ms": "2-10 (provisional)",
        "healthy_pingpong_us": "5-20 (provisional)",
    }))


if __name__ == "__main__":
    main()
