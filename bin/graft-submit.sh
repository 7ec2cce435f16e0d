#!/usr/bin/env bash
# Env-var submit wrapper — the reference's SANEF_Uploader.sh contract
# (/root/reference/SANEF_Uploader.sh:1-16: ten positional args drawn
# from environment variables, last one the reset flag) re-expressed as
# a spark-submit invocation of graft.jobs.JobRunner, which takes the
# SAME ten positionals (JobRunner.scala scaladoc). A reference user
# switches by swapping `python SANEF_Uploader.py` for this script with
# an unchanged environment.
#
# Required environment:
#   WAZI_ENDPOINT WAZI_TOKEN DATASET_ID IEC_TOKEN IEC_ENDPOINT
#   DB_SERVER DB DB_USERNAME DB_PASSWORD
# Optional:
#   RESET_DATASET   (default dont-reset, as the reference hardcodes)
#   GRAFT_MASTER    (default local[*]; set spark://... or yarn for a
#                    cluster — JobRunner reads it)
#   GRAFT_JAR       (default /app/graft.jar — the container layout)
#   SPARK_SUBMIT_OPTS_EXTRA  (appended verbatim: --num-executors etc.)

set -euo pipefail

: "${WAZI_ENDPOINT:?}" "${WAZI_TOKEN:?}" "${DATASET_ID:?}"
: "${IEC_TOKEN:?}" "${IEC_ENDPOINT:?}" "${DB_SERVER:?}" "${DB:?}"
: "${DB_USERNAME:?}" "${DB_PASSWORD:?}"

exec "${SPARK_HOME:-/opt/spark}/bin/spark-submit" \
  --class graft.jobs.JobRunner \
  --master "${GRAFT_MASTER:-local[*]}" \
  ${SPARK_SUBMIT_OPTS_EXTRA:-} \
  "${GRAFT_JAR:-/app/graft.jar}" \
  "$WAZI_ENDPOINT" \
  "$WAZI_TOKEN" \
  "$DATASET_ID" \
  "$IEC_TOKEN" \
  "$IEC_ENDPOINT" \
  "$DB_SERVER" \
  "$DB" \
  "$DB_USERNAME" \
  "$DB_PASSWORD" \
  "${RESET_DATASET:-dont-reset}"
