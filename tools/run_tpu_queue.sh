#!/bin/bash
# Serialized TPU measurement queue — ONE job at a time on the shared chip.
export PYTHONPATH=/root/repo:/root/.axon_site
cd /root/repo
out=/tmp/tpu_queue_results.txt
: > $out
for job in "exp_app" "exp_bwd" "profile_binning" "profile_stages"; do
  echo "=== $job ===" >> $out
  timeout 1200 python tools/$job.py 2>&1 | grep -v WARNING | grep "^{" >> $out
done
echo "=== bench ===" >> $out
timeout 1200 python bench.py 2>&1 | grep -v WARNING | grep "^{" >> $out
echo "=== partition_bench ===" >> $out
timeout 1200 python tools/partition_bench.py 2>&1 | grep -v WARNING | grep "^{" >> $out
echo "QUEUE DONE" >> $out
