#!/bin/bash
# Round-5 reference-workflow training chain (VERDICT r4 item 5, two rounds
# overdue): solver-generated Manta-layout dataset at the reference's
# workflow shape (scene dirs, 64 frames/scene, ref:
# pytorch/lib/dataset_load.py:34-127) -> preprocess -> train with the
# 5-term loss incl. long-term divergence -> one --resume -> eval_parity of
# the resulting checkpoint. ONE python at a time (1-core box); stages
# timeout-bounded; artifacts copied into docs/results/ only on success.
#
# Usage: nohup bash scripts/tpu_battery_r5.sh > /tmp/r5_chain.log 2>&1 &
set -x
cd /root/repo

SCENES_TR=${R5_SCENES_TR:-32}
SCENES_TE=${R5_SCENES_TE:-8}
EPOCHS=${R5_EPOCHS:-30}
EPOCHS2=${R5_EPOCHS2:-40}

# stage 1: dataset generation (~35 s/scene measured 2026-08-18 + compile)
if [ ! -f out/dataset/plume_mg/te/000007/000252.bin ]; then
  timeout ${R5_T_DATASET:-3600} python scripts/make_dataset.py \
      --out out/dataset --scenesTr "$SCENES_TR" --scenesTe "$SCENES_TE" \
      --res 128 > /tmp/r5_1_makedataset.log 2>&1
  tail -3 /tmp/r5_1_makedataset.log
fi

# stage 2: .bin -> .npz preprocessing (CPU pool + native parser)
timeout 2400 python scripts/preprocess_data.py --dataDir out/dataset \
    --dataset plume_mg --out out/dataset_pp --workers 2 \
    > /tmp/r5_2_preprocess.log 2>&1
tail -3 /tmp/r5_2_preprocess.log

# stage 3: train through the real dataset path (5-term loss w/ LT rollout)
timeout ${R5_T_TRAIN:-4500} python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --maxEpochs "$EPOCHS" \
    > /tmp/r5_3_train_e2e.log 2>&1
tail -6 /tmp/r5_3_train_e2e.log

# stage 4: checkpoint/resume through the same path (P11 at workflow scale)
timeout ${R5_T_RESUME:-2400} python scripts/train.py --dataDir out/dataset_pp \
    --modelDir trained_models/DataTrain_128 --resume --maxEpochs "$EPOCHS2" \
    > /tmp/r5_4_train_resume.log 2>&1
tail -6 /tmp/r5_4_train_resume.log

# stage 5: physics parity eval of the data-trained checkpoint
timeout 2400 python scripts/eval_parity.py \
    --modelDir trained_models/DataTrain_128 --res 128 --iters 600 \
    --out out/parity_datatrain > /tmp/r5_5_evalparity.log 2>&1
tail -8 /tmp/r5_5_evalparity.log

for f in /tmp/r5_1_makedataset.log /tmp/r5_3_train_e2e.log \
         /tmp/r5_4_train_resume.log /tmp/r5_5_evalparity.log; do
  [ -f "$f" ] || continue
  grep -q "Traceback" "$f" || cp -f "$f" docs/results/$(basename "$f" | \
      sed 's/r5_[0-9]*_//; s/\.log/_r5.log/')
done
# loss curves (7-col npy) live in the model dir; copy the summary json too
[ -f out/parity_datatrain/summary.json ] && \
  cp -f out/parity_datatrain/summary.json docs/results/parity_datatrain_r5.json

touch /tmp/r5_done
echo "r5 chain complete"
