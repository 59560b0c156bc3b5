#!/bin/bash
# Sweep 6 (round 2, post-compaction): micro-tune around the tuned point.
cd /root/repo
run() {
  echo "=== $*"
  timeout 2400 python bench.py "$@" 2>/dev/null | tail -1
}
run --repeat 4                                     # tuned defaults (control)
run --repeat 4 --wave 12288
run --repeat 4 --pump 1
run --repeat 4 --pump 3
run --repeat 4 --block-tris 28
run --repeat 4 --rm 3.0 --max-res 128
run --scene nefertiti --repeat 3                   # tuned defaults (control)
run --scene nefertiti --repeat 3 --wave 16384
run --scene nefertiti --repeat 3 --pump 1
run --scene parallel --size 512 --repeat 3         # control
run --scene parallel --size 512 --repeat 3 --wave 8192
run --scene parallel --size 512 --repeat 3 --block-tris 28
echo "=== sweep6 done"
