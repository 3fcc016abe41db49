#!/bin/bash
# Round-4 self-driving TPU chain: runs AFTER scripts/tpu_battery_r4.sh
# finishes its measurement window, in strict sequence (ONE CPU core — never
# two heavy python processes at once):
#
#   1. train the MGCoarse learned coarse-grid correction on the live chip
#      (VERDICT r3 item 8 prerequisite),
#   2. run the r4b follow-up battery (mg_learned qpm + in-step steps/s),
#   3. generate the multi-scene Manta-layout dataset with the solver,
#      preprocess it, and run scripts/train.py end-to-end over it with one
#      resume cycle (VERDICT r3 item 7).
#
# Every stage is timeout-bounded so a dying tunnel cannot wedge the chain.
# Usage: nohup bash scripts/tpu_chain_r4.sh > /tmp/r4_chain.log 2>&1 &
set -x
cd /root/repo

# ---- wait for the main battery to release the chip + the core --------------
for i in $(seq 1 720); do
  [ -f /tmp/r4_battery_done ] && break
  sleep 60
done
[ -f /tmp/r4_battery_done ] || { echo "main battery never finished"; exit 1; }

# ---- stage 1: train the learned coarse-grid correction ---------------------
timeout 5400 python scripts/train_mg_coarse.py --res 512 --frames 256 \
    --steps 2000 --modelDir trained_models/MGCoarse_128 \
    > /tmp/r4_mgcoarse_train.log 2>&1
tail -6 /tmp/r4_mgcoarse_train.log
grep -q "step 2000" /tmp/r4_mgcoarse_train.log && \
  cp -f /tmp/r4_mgcoarse_train.log docs/results/mg_coarse_train_r4.log

# ---- stage 2: r4b follow-up battery (needs the checkpoint) -----------------
if [ -d trained_models/MGCoarse_128/best ]; then
  bash scripts/tpu_battery_r4b.sh > /tmp/r4b_battery.log 2>&1
  tail -4 /tmp/r4b_battery.log
else
  echo "no MGCoarse checkpoint — skipping r4b"
fi

# ---- stage 3: solver-generated multi-scene Manta-layout dataset ------------
timeout 14400 python scripts/make_dataset.py --out out/dataset \
    --scenesTr 32 --scenesTe 8 --res 128 > /tmp/r4_makedataset.log 2>&1
tail -3 /tmp/r4_makedataset.log
timeout 3600 python scripts/preprocess_data.py --dataDir out/dataset \
    --dataset plume_mg --out out/dataset_pp --workers 2 \
    > /tmp/r4_preprocess.log 2>&1
tail -3 /tmp/r4_preprocess.log

# ---- stage 4: end-to-end training through the real dataset path ------------
timeout 7200 python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --maxEpochs 60 \
    > /tmp/r4_train_e2e.log 2>&1
tail -6 /tmp/r4_train_e2e.log
# resume once (proves the checkpoint/resume seam on the same path)
timeout 3600 python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --resume --maxEpochs 80 \
    > /tmp/r4_train_e2e_resume.log 2>&1
tail -6 /tmp/r4_train_e2e_resume.log
grep -q "resumed at epoch" /tmp/r4_train_e2e_resume.log && {
  cp -f /tmp/r4_train_e2e.log docs/results/train_e2e_dataset_r4.log
  cp -f /tmp/r4_train_e2e_resume.log docs/results/train_e2e_resume_r4.log
}

touch /tmp/r4_chain_done
echo "R4 CHAIN DONE"
