#!/bin/bash
# Post-outage measurement plan: run once when the axon tunnel answers
# again (watcher: /tmp/tpu_watch.log).  Order matters — cheap probes
# first, then the pallas adoption decision, then the big demos/bench.
# Each step is individually timeout-bounded so a re-wedged tunnel
# cannot hang the plan; partial results land in /tmp/recovery_*.log.
set -u
cd /root/repo
export PYTHONPATH="/root/repo:/root/.axon_site"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date)) ===" | tee -a /tmp/recovery_summary.log
  timeout "$t" "$@" > "/tmp/recovery_${name}.log" 2>&1
  echo "$name exit=$? ($(date))" | tee -a /tmp/recovery_summary.log
  tail -5 "/tmp/recovery_${name}.log" | tee -a /tmp/recovery_summary.log
}

# 0. backend answers?
run probe 300 python -c "import jax; print(jax.devices())"

# 1. does pallas lower on this backend at all? (tiny shapes, fast)
run pallas_smoke 900 python - <<'EOF'
import jax
import jax.numpy as jnp
import numpy as np
from auto_oo_tpu.ops import grid
from auto_oo_tpu.ops.pallas_grid import phi_all_pallas
gm = grid.build_grid_maps(4, 4)
x = jnp.asarray(np.random.default_rng(0).standard_normal(gm.dim), jnp.float32)
out = phi_all_pallas(x, gm)          # compiled (not interpret) on TPU
ref = grid._phi_all_xla(x, gm)
print("pallas-on-chip maxerr:", float(jnp.abs(out - ref).max()))
EOF

# 2. adoption microbench at the two production sector scales
run microbench10 1800 python scripts/microbench_pallas.py 10 8
run microbench12 2400 python scripts/microbench_pallas.py 12 4

# 2b. adjoint vs plain-AD circuit gradient (reversible backward)
run adjoint12 1800 python scripts/microbench_adjoint.py 12 1

# 3. the (14e,14o) single-chip demo (round-4 pending measurement;
#    gradient step now runs the adjoint backward)
run demo14 5400 python scripts/demo_14e14o.py 1

# 4. full driver bench (includes the 10e10o pallas A/B tier)
run bench 7200 python bench.py

# 5. on-chip correctness tier
run tputests 3600 env AUTO_OO_TPU_TESTS=1 python -m pytest -m tpu tests/ -q

echo "RECOVERY PLAN DONE ($(date))" | tee -a /tmp/recovery_summary.log
