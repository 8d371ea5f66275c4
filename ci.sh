#!/usr/bin/env bash
# CI for the TPU-native framework — the Python-level mirror of the
# reference's `.gitlab-ci.yml` (build matrix + ctest) and `run_format.sh`
# (clang-format): lint, byte-compile, native-extension build, and the full
# pytest suite on an 8-device virtual CPU mesh (tests/conftest.py).
set -euo pipefail
cd "$(dirname "$0")"

echo "== lint =="
python tools/lint.py evo_tpu tests tools bench.py __graft_entry__.py

echo "== byte-compile =="
python -m compileall -q evo_tpu tests tools bench.py __graft_entry__.py

echo "== native build =="
env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python - <<'EOF'
from evo_tpu import native
lib = native.load()
print("native event parser:", "built" if lib is not None else "numpy fallback")
EOF

echo "== tests =="
python -m pytest tests/ -q "$@"

echo "CI OK"
