#!/bin/bash
# One-shot TPU revalidation after source changes or a service outage:
#   1. tiny-op probe (fails fast if the axon service is still down)
#   2. kernel sanity at flagship shapes (flash vs XLA beam)
#   3. full benchmark line
#   4. serving batch sweep
# Run WITHOUT timeout(1) — a killed client wedges the single-tenant
# device (CLAUDE.md). Logs land in /tmp/reval_*.log.
set -e
export PYTHONPATH=/root/repo:/root/.axon_site

echo "[1/4] probe"
python -c "
import jax, jax.numpy as jnp
print('probe:', float(jnp.sum(jnp.ones((8,8)))), jax.devices())
" 2>&1 | tail -1

echo "[2/4] kernel parity (check_flash_tpu -> benchmarks/flash_tpu.json)"
# writes the committed on-hardware parity artifact: staged margin-based
# checks (tf greedy/beam rescored vs an independent HIGHEST-precision
# scorer, LAS greedy margins, fused-LAS grad deviations) — token identity
# on-chip is unattainable even XLA-vs-XLA (see the recorded control);
# exits non-zero when a margin/deviation threshold trips
python /root/repo/scripts/check_flash_tpu.py 2>&1 | tail -30

echo "[3/4] bench"
python /root/repo/bench.py 2>&1 | tail -1 | tee /tmp/reval_bench.log

echo "[4/4] serving batch sweep"
python /root/repo/scripts/probe_serving_batch.py 2>&1 | tee /tmp/reval_serving.log
