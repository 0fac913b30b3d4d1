#!/bin/bash
# Full-width hypervisor-steal probe for the scaling campaign.
#
# Round-5 finding: this VM's host steals 2-4 cores ONLY under full-width
# (32-core) load; an idle-host check reads 0.0 steal minutes before a
# 32-leg gets dragged.  So: load every core for ~15 s and measure the
# /proc/stat steal delta DURING the load.  Launch `bench.py --scaling`
# only when this prints < ~0.5 (cores of steal); above that, every 32-leg
# attempt will be rejected by the co-tenant gate and the run wastes
# ~20 min producing a not-interpretable record.
#
# Usage: tools/steal_probe.sh   # prints steal cores under full load
n=$(nproc)
for i in $(seq 0 $((n - 1))); do
    taskset -c "$i" python3 -c "
import time
t = time.time()
while time.time() - t < 15:
    pass" &
done
sleep 2
s1=$(grep "^cpu " /proc/stat)
sleep 10
s2=$(grep "^cpu " /proc/stat)
wait
python3 - "$s1" "$s2" <<'PYEOF'
import sys

a = [int(x) for x in sys.argv[1].split()[1:]]
b = [int(x) for x in sys.argv[2].split()[1:]]
d = [y - x for x, y in zip(a, b)]
# field 7 = steal jiffies; 10 s window at USER_HZ=100
print(round(d[7] / 10 / 100, 2))
PYEOF
