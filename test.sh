#!/usr/bin/env bash
# Counterpart of the reference's test.sh (build wheel, install into a scratch
# prefix, pytest the installed package — /root/reference/test.sh:1-17), adapted:
# no native build step (kernels JIT under XLA), and the suite runs on a virtual
# 8-device CPU mesh (tests/conftest.py) so no TPU is needed.
set -euo pipefail

cd "$(dirname "$0")"

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT

python -m pip wheel --no-deps -w "$TMP" . >/dev/null
python -m pip install --no-deps --target "$TMP/site" "$TMP"/megastep_tpu-*.whl >/dev/null

# Run the test suite against the *installed* package from a scratch dir.
# PALLAS_AXON_POOL_IPS is unset so sitecustomize skips axon-pool registration:
# CPU-only runs then compile locally instead of through the (flaky, slow)
# remote-compile tunnel.
cp -r tests pyproject.toml "$TMP/"
(cd "$TMP" && env -u PALLAS_AXON_POOL_IPS PYTHONPATH="$TMP/site" \
    python -m pytest tests/ -q "$@")
