#!/bin/bash
# Install the repo's git hooks (pre-commit = tools/fast_proof.sh).
set -e
cd "$(dirname "$0")/.."
cat > .git/hooks/pre-commit <<'EOF'
#!/bin/bash
# Auto-installed by tools/install_hooks.sh — keep snapshots green:
# block commits that break the export-surface proof set.
exec bash "$(git rev-parse --show-toplevel)/tools/fast_proof.sh"
EOF
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed (tools/fast_proof.sh)"
