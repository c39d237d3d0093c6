#!/bin/bash
# Recommended-settings wrapper, mirroring /root/reference/ProGraphMSA.sh:33:
# Darwin model, CS profiles, ML distances, estimated AA frequencies, FASTA out.
# The CS library path can be overridden with PROGRAPHMSA_CS_LIB; by default the
# reference's K4000.lib location is used if present, else the bundled test
# library (the upstream K4000.lib blob is not redistributed).
set -e
DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
CS_LIB="${PROGRAPHMSA_CS_LIB:-}"
if [[ -z "${CS_LIB}" ]]; then
   for cand in "${DIR}/3rd_party/K4000.lib" "${DIR}/fixtures/cs16.lib"; do
      if [[ -s "${cand}" ]]; then CS_LIB="${cand}"; break; fi
   done
fi
if [[ -z "${CS_LIB}" ]]; then
   echo "No CS profile library found; set PROGRAPHMSA_CS_LIB" >&2
   exit 1
fi
exec python -m prographmsa_tpu.cli --darwin --cs_profile "${CS_LIB}" \
   --mldist --estimate_aafreqs --fasta "$@"
