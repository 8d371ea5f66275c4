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
# XLA:CPU JIT-allocates code pages per compiled executable; the full suite
# compiles enough programs to exhaust the kernel's default map budget
# (vm.max_map_count=65530 → mmap ENOMEM → LLVM "Cannot allocate memory" →
# segfault). Raise the budget when privileged, and run the suite in three
# processes regardless so each stays well under the default.
sysctl -qw vm.max_map_count=1048576 2>/dev/null || true
if [ $# -gt 0 ]; then
  python -m pytest tests/ -q "$@"
else
  # every tests/test_*.py lands in exactly one of 3 round-robin shards
  for shard in 0 1 2; do
    files=$(ls tests/test_*.py | awk -v s="$shard" 'NR % 3 == s')
    # shellcheck disable=SC2086
    python -m pytest -q $files
  done
fi

echo "CI OK"
