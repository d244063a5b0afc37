#!/bin/sh
# Builds the docs site and publishes it to the gh-pages branch.
# Counterpart of the reference's sphinx publish pipeline
# (/root/reference/publish.sh), without the sphinx dependency.
set -e

python docs/genapi.py
python docs/build.py

branch=$(git rev-parse --abbrev-ref HEAD)
git branch --delete --force gh-pages 2>/dev/null || true
# The orphan checkout keeps the whole tree staged; committing it all and then
# subdirectory-filtering to the site removes the other files from the worktree,
# so the final checkout back is clean (a `git reset` here leaves everything
# untracked and the checkout refuses to overwrite it).
git checkout --orphan gh-pages
git add -f docs/_site
git commit -m "Rebuild GitHub pages"
git filter-branch -f --prune-empty --subdirectory-filter docs/_site
git push -f origin gh-pages || echo "no origin remote; gh-pages built locally"
git checkout "$branch"
