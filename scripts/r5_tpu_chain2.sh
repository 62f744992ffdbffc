#!/bin/bash
# Second TPU chain: wait for the stress chain, then run the second A/B
# probe and a full bench with the new defaults.
set -x
cd /root/repo
while [ ! -f /tmp/stress_chain.done ]; do sleep 30; done
timeout 3600 python scripts/probe_r5_ab2.py > /tmp/r5_ab2.log 2>&1
timeout 3000 python bench.py > /tmp/bench_r5.json 2> /tmp/bench_r5.log
echo DONE > /tmp/chain2.done
