#!/bin/bash
# Sweep 5: unclamp the per-axis grid cap (reference's 64 is not a TPU law).
cd /root/repo
run() {
  echo "=== $*"
  timeout 2400 python bench.py "$@" 2>&1 | grep -v -i warning | tail -1
}
run --scheduler persistent --fused on --size 1024 --repeat 4 --block-tris 14 --wave 8192 --pump 2 --rm 1.25 --max-res 96
run --scheduler persistent --fused on --size 1024 --repeat 4 --block-tris 14 --wave 8192 --pump 2 --rm 1.5  --max-res 128
run --scheduler persistent --fused on --size 1024 --repeat 4 --block-tris 14 --wave 8192 --pump 2 --rm 2.0  --max-res 128
run --scene nefertiti --scheduler persistent --fused on --size 1024 --repeat 3 --block-tris 28 --wave 8192 --pump 2 --rm 1.25
run --scene nefertiti --scheduler persistent --fused on --size 1024 --repeat 3 --block-tris 28 --wave 8192 --pump 2 --rm 1.5 --max-res 96
run --scene nefertiti --scheduler persistent --fused on --size 1024 --repeat 3 --block-tris 14 --wave 8192 --pump 2 --rm 1.5 --max-res 128
echo "=== sweep5 done"
