#!/bin/bash
# Run the test suite on the virtual 8-device CPU mesh, immune to a wedged
# TPU tunnel. The axon sitecustomize hook (gated on PALLAS_AXON_POOL_IPS)
# is installed at interpreter start and makes `import jax` dial the relay;
# while the tunnel is wedged that hangs every process — including pure-CPU
# pytest — and clearing the var in-process is too late. It must be cleared
# BEFORE python starts, which is this wrapper's only job.
#
#   tools/pytest_cpu.sh            # full suite
#   tools/pytest_cpu.sh -m fast    # fast tier (<10 min)
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
