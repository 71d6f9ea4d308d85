#!/bin/bash
# Sequential wiki-vote-unseen node-view trials 2-4 (same pinned params +
# label caches as trial 1), one TPU job at a time. Waits for any existing
# TPU worker (tracked via /tmp/wv.pid) to exit first.
cd /root/repo
while kill -0 $(cat /tmp/wv.pid 2>/dev/null) 2>/dev/null; do sleep 30; done
for t in 2 3 4; do
  python -u -m gn_ode_sir_tpu.cli.worker \
    --lr 0.001 --epochs 500 --hidden 8 --batch_size 8 \
    --train_val_test_ratio 0.6 0.2 0.2 --deltaT 0.5 --maxTime 20 \
    --sim 10000 --trial $t \
    --dataset ./real_graphs/dolphins+fb-food+fb-social+openflights+wiki-vote \
    --path_to_save ./runs_r4/ngraphs_wv_nv --model ode_nn \
    --seed 0 --init_seed $((t-1)) \
    > runs_r4/wv_trial${t}_nodeview.log 2>&1
  echo "[chain_wv] trial $t rc=$?"
  sleep 10
done
echo "[chain_wv] done"
