#!/bin/bash
# Tandem-repeat-aware wrapper, mirroring /root/reference/ProGraphMSA+TR.sh:66:
# repeat-aware indel parameters + T-Reks detection + ML distances.
# T-Reks.jar is looked for next to this script (PROGRAPHMSA_TREKS_JAR
# overrides); unlike the reference wrapper it is never downloaded
# automatically — point the variable at an existing jar, or use
# --read_repeats to skip detection entirely.
set -e
DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
JAR="${PROGRAPHMSA_TREKS_JAR:-${DIR}/T-Reks.jar}"
if [[ -s "${JAR}" ]]; then
   export PROGRAPHMSA_TREKS_JAR="${JAR}"
elif [[ ! $* =~ read_repeats && ! $* =~ custom_tr_cmd ]]; then
   echo "T-Reks.jar not found (set PROGRAPHMSA_TREKS_JAR, pass --custom_tr_cmd, or use --read_repeats)" >&2
   exit 1
fi
exec python -m prographmsa_tpu.cli --repeat_indel_rate 0.1 \
   --repeat_indel_ext 0.3 --mldist --repeats --fasta "$@"
