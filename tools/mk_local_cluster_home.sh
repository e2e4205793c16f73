#!/bin/sh
# Writable SPARK_HOME shim for GRAFT_MASTER=local-cluster runs.
#
# local-cluster workers place executor sandboxes (and their
# stdout/stderr) under $SPARK_HOME/work; /opt/spark is the shared
# read-only distribution this sandbox must not write into. The shim
# symlinks the distribution payload and owns a real work/ under the
# repo's target/, so multi-executor runs leave their droppings (and
# their inspectable executor logs) inside the repo.
#
# Usage:
#   tools/mk_local_cluster_home.sh          # prints the shim path
#   SPARK_HOME=$(tools/mk_local_cluster_home.sh) SPARK_SCALA_VERSION=2.13 \
#     GRAFT_MASTER='local-cluster[4,8,7168]' sbt "runMain graft.Bench"
set -e
cd "$(dirname "$0")/.."
H=target/spark-home
mkdir -p "$H/work"
for d in jars bin sbin conf data python R examples licenses kubernetes \
    yarn LICENSE NOTICE RELEASE README.md; do
  # -h too: -e follows symlinks, so a dangling link (distribution
  # missing that entry) would read as absent and the re-run's ln -s
  # would die on "File exists" under set -e
  if [ ! -e "$H/$d" ] && [ ! -h "$H/$d" ] && [ -e "/opt/spark/$d" ]; then
    ln -s "/opt/spark/$d" "$H/$d"
  fi
done
echo "$PWD/$H"
