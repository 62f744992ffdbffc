#!/bin/bash
# Round-5 robustness chain: wait for the A/B probe to release the chip,
# then fabricate detector-pathology stress scenes and run the default +
# pidinet protocols on them (VERDICT r4 item 6).  Serialized because only
# one process can hold the TPU grant.
set -x
cd /root/repo

# wait for probe_r5_ab to exit (PID passed as $1, or poll the log)
if [ -n "$1" ]; then
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
fi

# 1. stress scene, DexiNed-style (default protocol)
timeout 2400 python scripts/make_ref_scale_scene.py \
  --out data/refstress --size 1600 --views 50 --curves 24 --lines 8 \
  --seed 3 --dropout-frac 0.12 --double-edge 0.45 --salt 0.001 \
  >/tmp/stress_fab1.log 2>&1

# 2. stress scene, PidiNet-style (soft/thick + pathologies)
timeout 2400 python scripts/make_ref_scale_scene.py \
  --out data/refstress_pidi --size 1024 --views 50 --curves 16 --lines 6 \
  --seed 4 --detector PidiNet --edge-blur 1.5 --gt-width 0.005 \
  --dropout-frac 0.12 --double-edge 0.45 --salt 0.001 \
  >/tmp/stress_fab2.log 2>&1

# 3. default protocol on the stress scene (full 10k schedule)
timeout 5400 python train.py -s data/refstress -m output_refstress -r 2 \
  --detector DexiNed --eval --quiet >/tmp/stress_train1.log 2>&1

# 4. pidinet protocol on the soft stress scene
timeout 5400 python train.py -s data/refstress_pidi -m output_refstress_pidi \
  -r 2 --preset pidinet --detector PidiNet --eval --quiet \
  >/tmp/stress_train2.log 2>&1

echo DONE > /tmp/stress_chain.done
