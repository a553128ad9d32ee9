#!/usr/bin/env bash
# Sync the local workspace to remote TPU VMs and pull remote logs back
# (ignoring logs that are newer on the receiver).
# Parity surface: reference scripts/sync.sh (rsync both ways over a remote
# list in a conf file). TPU flavor: remotes may be plain rsync targets
# (user@host:path) OR `tpu:<name>:<zone>:<path>` entries, which expand to
# every worker of a (possibly multi-host) Cloud TPU VM via
# `gcloud compute tpus tpu-vm scp/ssh` — code must land on ALL workers for a
# multi-host jax.distributed launch.
set -o errexit
set -o nounset
set -o pipefail

if [[ "${TRACE-0}" == "1" ]]; then
    set -o xtrace
fi

if [[ "${1-}" =~ ^-*h(elp)?$ ]]; then
    echo 'usage: sync.sh [-h]

Sync the local workspace to each remote in scripts/sync.conf and the remote
logs/ back to local. Lines in sync.conf:

  user@host:/path/to/workspace      # plain rsync remote
  tpu:NAME:ZONE:/path/to/workspace  # all workers of a Cloud TPU VM
'
    exit
fi

cd "$(dirname "$0")"
while [ "$(find . -maxdepth 1 -name pyproject.toml | wc -l)" -ne 1 ]; do cd ..; done

main() {
    logs_exclude_patterns=("/debug/" "/xplane/" "/tests/")
    workspace_exclude_patterns=(
        ".cache" ".venv" ".pytest_cache" ".vscode" "__pycache__"
        "/data/" "/libs/" "/models/" "/logs/" "/wandb/" "*.db"
    )

    config_file="scripts/sync.conf"
    if [ ! -f "$config_file" ]; then
        echo "[error] Configuration file not found at scripts/sync.conf"
        exit 1
    fi

    workspace_exclude_opts=()
    for pattern in "${workspace_exclude_patterns[@]}"; do
        workspace_exclude_opts+=("--exclude" "$pattern")
    done
    logs_exclude_opts=()
    for pattern in "${logs_exclude_patterns[@]}"; do
        logs_exclude_opts+=("--exclude" "$pattern")
    done

    while IFS= read -r remote || [ -n "$remote" ]; do
        [[ -z "$remote" || "$remote" =~ ^[[:space:]]*# ]] && continue
        if [[ "$remote" == tpu:* ]]; then
            IFS=':' read -r _ name zone path <<< "$remote"
            echo "[info] Syncing $(pwd) to TPU VM $name (all workers) ..."
            tar czf /tmp/lmms_owc_sync.tgz "${workspace_exclude_opts[@]}" \
                --exclude-vcs -C . .
            gcloud compute tpus tpu-vm scp /tmp/lmms_owc_sync.tgz \
                "$name:/tmp/lmms_owc_sync.tgz" --zone "$zone" --worker=all
            gcloud compute tpus tpu-vm ssh "$name" --zone "$zone" --worker=all \
                --command "mkdir -p '$path' && tar xzf /tmp/lmms_owc_sync.tgz -C '$path'"
            echo "[info] Syncing $name worker-0 $path/logs/ back to ./logs ..."
            gcloud compute tpus tpu-vm scp --recurse \
                "$name:$path/logs" . --zone "$zone" --worker=0 || true
        else
            echo "[info] Syncing $(pwd) to $remote ..."
            rsync -azh "${workspace_exclude_opts[@]}" . "$remote"
            echo "[info] Syncing $remote/logs/ to $(pwd)/logs ..."
            rsync --update -azh "${logs_exclude_opts[@]}" "$remote/logs/" "./logs/" || true
        fi
    done < "$config_file"
}

main "$@"
