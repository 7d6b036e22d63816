#!/bin/bash
# Round-5 serialized TPU benchmark queue (one TPU chip; steps run in order).
cd /root/repo
set -x

# 1. Fully-dynamic rod rows: demos AND eval under full arm dynamics
timeout 3600 python run_benchmark.py --tasks sorting_2 pushing \
    --agents bc gmm --seeds 0 --data data_dyn --out results --rerun

# 2. sorting_4/6 + inserting nonzero probe: 4x training budget
timeout 5400 python run_benchmark.py --tasks sorting_4 sorting_6 inserting \
    --agents gmm bc --seeds 0 --epochs 400 --kinematic --rerun

# 3. pushing diffusion with the transformer score backbone (registry
#    agent_kw wires backbone=gpt window=5 for beso on pushing)
timeout 3600 python run_benchmark.py --tasks pushing --agents beso \
    --seeds 0 --kinematic --rerun

echo QUEUE_DONE
