#!/bin/bash
# Round-2 knob sweep: need_t=False renderer + pump + block_tris
cd /root/repo
B="timeout 2400 python bench.py --scheduler persistent --fused on --size 1024 --repeat 4"
echo "=== spot w8192 p1";      $B --wave 8192  --pump 1 2>&1 | tail -1
echo "=== spot w8192 p2";      $B --wave 8192  --pump 2 2>&1 | tail -1
echo "=== spot w8192 p4";      $B --wave 8192  --pump 4 2>&1 | tail -1
echo "=== spot w16384 p2";     $B --wave 16384 --pump 2 2>&1 | tail -1
echo "=== spot w8192 p2 bt28"; $B --wave 8192  --pump 2 --block-tris 28 2>&1 | tail -1
echo "=== spot w8192 p2 bt14"; $B --wave 8192  --pump 2 --block-tris 14 2>&1 | tail -1
