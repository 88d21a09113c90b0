#!/bin/bash
# Round-5 phase C: full image-level matrix (reloc armed) + feature-level
# offline sanity + clean online free-run rerun. One TPU process at a time.
set -x
cd /root/repo

# 1. Image-level 6-sequence matrix, 1500 frames, n=2, reloc armed
#    (VERDICT r4 item 3 done-bar)
timeout 7200 python tools/evaluate_image.py \
  --seqs V1_01_easy,V1_02_medium,V1_03_difficult,V2_01_easy,V2_02_medium,V2_03_difficult \
  --frames 1500 --runs 2 --reloc 1 --out expr_img_r5 2>&1 | tail -40

# 2. Feature-level offline protocol sanity after the r5 mapping rewrite
#    (full length, production config, 3 sequences x n=2)
timeout 5400 python tools/evaluate.py --runs 2 --frames 4000 \
  --seqs V1_01_easy,V1_03_difficult,V2_02_medium \
  --out expr_r5_feat 2>&1 | tail -20

# 3. Clean online free-run rerun (the phase-A run was CPU-contended)
timeout 2400 python tools/evaluate.py --online --depth 4 --runs 2 \
  --frames 4000 --start 0 --seqs V1_01_easy,V2_01_easy \
  --out expr_online_r5b 2>&1 | tail -16

echo "R5 QUEUE PHASE C DONE"
