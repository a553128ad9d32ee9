#!/usr/bin/env bash
# Interactive IPython session with the project environment loaded.
# Parity surface: reference scripts/interact.sh (uvx ipython + autoreload +
# dotenv); TPU additions: persistent XLA compilation cache so remote compiles
# from prior sessions are reused, and LMMS_OWC_INTERACT_CPU=1 to pin the CPU
# backend (skip the TPU tunnel) for host-side work.
set -o errexit
set -o nounset
set -o pipefail

if [[ "${TRACE-0}" == "1" ]]; then
    set -o xtrace
fi

if [[ "${1-}" =~ ^-*h(elp)?$ ]]; then
    echo 'usage: interact.sh [-h]

Launch an IPython session with the project environment loaded.

  LMMS_OWC_INTERACT_CPU=1   pin the CPU backend (no TPU init)
  JAX_COMPILATION_CACHE_DIR overrides the compile-cache location
'
    exit
fi

cd "$(dirname "$0")"
while [ "$(find . -maxdepth 1 -name pyproject.toml | wc -l)" -ne 1 ]; do cd ..; done

main() {
    export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jax_cache}"
    local exec_lines=(
        --InteractiveShellApp.exec_lines "import dotenv; _ = dotenv.load_dotenv(dotenv.find_dotenv())"
    )
    if [[ "${LMMS_OWC_INTERACT_CPU-0}" == "1" ]]; then
        exec_lines+=(--InteractiveShellApp.exec_lines "import jax; jax.config.update('jax_platforms', 'cpu')")
    fi
    exec_lines+=(--InteractiveShellApp.exec_lines "import lmms_owc_tpu")
    python -m IPython \
        --InteractiveShellApp.extra_extensions "autoreload" \
        --InteractiveShellApp.exec_lines "%autoreload 2" \
        "${exec_lines[@]}" \
        --InteractiveShell.xmode "Context" \
        --no-banner --no-confirm-exit --pprint
}

main "$@"
