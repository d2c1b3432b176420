#!/bin/bash
# Sanitizer lane for the native C++ components (oracle, preprocess, frame
# ring, HTTP front end) — the "race detection / sanitizers" aux subsystem
# the reference lacks (SURVEY.md §5 lists none; closest were testbench X/Z
# checks). Rebuilds the shared object with ASan or TSan into a throwaway
# build dir and runs the native test suites under the preloaded runtime.
#
#   scripts/sanitize_native.sh asan   # leaks, overflows, UAF
#   scripts/sanitize_native.sh tsan   # data races in ring/http threading
#
# Results (2026-08-17, this toolchain): both lanes CLEAN — see
# docs/ROADMAP.md.
set -euo pipefail
MODE="${1:-asan}"
cd "$(dirname "$0")/.."

case "$MODE" in
  asan) FLAG="-fsanitize=address"; RT=$(g++ -print-file-name=libasan.so)
        # leak checking OFF: LSan would report CPython's own importer/
        # interning allocations (the host interpreter is uninstrumented);
        # overflows/UAF in OUR code still abort at the faulting access
        export ASAN_OPTIONS="detect_leaks=0:abort_on_error=1" ;;
  tsan) FLAG="-fsanitize=thread";  RT=$(g++ -print-file-name=libtsan.so)
        export TSAN_OPTIONS="halt_on_error=0:report_bugs=1" ;;
  *) echo "usage: $0 asan|tsan" >&2; exit 2 ;;
esac

BUILD_DIR=$(mktemp -d "/tmp/tcnn_${MODE}_XXXX")
trap 'rm -rf "$BUILD_DIR"' EXIT
export TPU_CNN_BUILD_DIR="$BUILD_DIR"
export TPU_CNN_EXTRA_CXXFLAGS="$FLAG"

# Python itself is uninstrumented, so the sanitizer runtime must be
# preloaded. ASan flags interceptors on librt etc. loaded after it —
# verify_asan_link_order=0 quiets that for the ctypes use case. XLA
# compilation crashes under the preloaded runtime (uninstrumented jaxlib),
# so the lane selects the native-only tests (oracle conv, preprocess
# twins' ctypes side, frame ring, HTTP front end) — everything the C++
# actually does, none of the jit paths the sanitizer can't host.
if [ "$MODE" = asan ]; then
  export ASAN_OPTIONS="$ASAN_OPTIONS:verify_asan_link_order=0"
fi
echo "== $MODE lane: rebuilding native .so with $FLAG into $BUILD_DIR =="
LD_PRELOAD="$RT" python -m pytest \
  tests/test_native_oracle.py \
  tests/test_serve_and_preprocess.py::test_native_front_end_service \
  -q -p no:cacheprovider \
  -k "native_vs or edge_images or uses_native or shift_variation or frame_ring or front_end"
echo "== $MODE lane PASSED =="
