"""Quick host-state probe: python single-core loop + multicore spin, plus steal delta.
Quiet reference (recorded r15): loop10m ~?s. Use relative readings across the round."""
import time, os, subprocess

def steal():
    f = open('/proc/stat').readline().split()
    return int(f[8]), sum(int(x) for x in f[1:])

s0, t0j = steal()
t0 = time.perf_counter()
s = 0
for i in range(10_000_000):
    s += i
dt = time.perf_counter() - t0
s1, t1j = steal()
print(f"loop10m={dt:.3f}s steal_delta={(s1-s0)/100:.2f}s wall={dt:.2f}s")
