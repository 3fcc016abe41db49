#!/bin/bash
# Round-4 session-5 closing chain: the end-to-end dataset workflow
# (VERDICT r3 item 7) sized to complete inside the remaining window, so
# the box is idle when the driver's round-end bench runs. ONE python at a
# time; stages timeout-bounded; artifacts copied into docs/results/ only
# on success.
#
# Usage: nohup bash scripts/tpu_battery_r4e.sh > /tmp/r4e_chain.log 2>&1 &
set -x
cd /root/repo

SCENES_TR=${R4E_SCENES_TR:-16}
SCENES_TE=${R4E_SCENES_TE:-4}
EPOCHS=${R4E_EPOCHS:-40}
EPOCHS2=${R4E_EPOCHS2:-50}

timeout ${R4E_T_DATASET:-2400} python scripts/make_dataset.py \
    --out out/dataset --scenesTr "$SCENES_TR" --scenesTe "$SCENES_TE" \
    --res 128 > /tmp/r4e_1_makedataset.log 2>&1
tail -3 /tmp/r4e_1_makedataset.log
timeout 1800 python scripts/preprocess_data.py --dataDir out/dataset \
    --dataset plume_mg --out out/dataset_pp --workers 2 \
    > /tmp/r4e_2_preprocess.log 2>&1
tail -3 /tmp/r4e_2_preprocess.log
timeout ${R4E_T_TRAIN:-2700} python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --maxEpochs "$EPOCHS" \
    > /tmp/r4e_3_train_e2e.log 2>&1
tail -6 /tmp/r4e_3_train_e2e.log
timeout ${R4E_T_RESUME:-1200} python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --resume --maxEpochs "$EPOCHS2" \
    > /tmp/r4e_4_train_resume.log 2>&1
tail -6 /tmp/r4e_4_train_resume.log
for f in /tmp/r4e_3_train_e2e.log /tmp/r4e_4_train_resume.log; do
  grep -q "Traceback" "$f" || cp -f "$f" docs/results/$(basename "$f" | \
      sed 's/r4e_[0-9]*_//; s/\.log/_r4.log/')
done
grep -q "Traceback" /tmp/r4e_1_makedataset.log || \
  cp -f /tmp/r4e_1_makedataset.log docs/results/make_dataset_r4.log

touch /tmp/r4e_done
echo "r4e chain complete"
