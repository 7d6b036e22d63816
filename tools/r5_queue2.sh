#!/bin/bash
# Round-5 TPU queue, stage 2 (trimmed to the session budget; value order).
cd /root/repo
set -x

# 1. sorting_6 fault bisect: round-4 eval was clean, round-5 faults — is it
#    the new Pallas IK-window kernel or elsewhere?
timeout 900 python tools/repro_sorting6_fault.py --kernel 1 \
    > /tmp/repro_s6_k1.log 2>&1
tail -3 /tmp/repro_s6_k1.log
timeout 900 python tools/repro_sorting6_fault.py --kernel 0 \
    > /tmp/repro_s6_k0.log 2>&1
tail -3 /tmp/repro_s6_k0.log

# 2. sorting_4 with history-carrying agents (order-commitment hypothesis)
timeout 5400 python run_benchmark.py --tasks sorting_4 --agents lstm_gmm \
    gpt_bc --seeds 0 --epochs 150 --kinematic --rerun

# 3. vision: first stochastic-head row (entropy > 0)
timeout 3600 python run_vision.py --task avoiding --agent gmm_vision \
    --epochs 20 --seed 0 --log-dir results > /tmp/gmm_vision_row.log 2>&1
tail -1 /tmp/gmm_vision_row.log

# 4. aligning: bigger, mode-balanced demo set + longer training
timeout 2400 python tools/gen_demos.py --task aligning --n 400 --seed 21
timeout 5400 python run_benchmark.py --tasks aligning --agents bc gmm \
    --seeds 0 --epochs 200 --kinematic --rerun

echo QUEUE2_DONE
