#!/bin/bash
# Build the reference from source (oracle for instrumented debugging and for
# the *_src golden variants).
#
# Why a source build exists alongside bin/ProGraphMSA_64: the 2013 prebuilt
# binary and a from-source build of the same code disagree on inputs where
# BioNJ hits near-ties — ULP-level differences in the build's math library /
# Eigen vectorization get amplified through the iterative distance-matrix
# reduction (observed on fixtures/rep8.fasta free-tree runs: same topology,
# branch lengths differing in the 4th decimal).  Our implementation is
# bit-identical to the source build on those inputs and to the prebuilt
# binary everywhere else (all other goldens).
#
# Eigen comes from the tensorflow wheel's bundled headers; tclap is copied
# from the reference's expectations (header-only, fetched in round 1).
set -e
SRC=/tmp/refsrc
if [ ! -d "$SRC" ]; then
  cp -r /root/reference "$SRC"
  chmod -R u+w "$SRC"
fi
mkdir -p "$SRC/build"
cd "$SRC/build"
cmake .. -DEIGEN_INCLUDE_DIR=/opt/venv/lib/python3.12/site-packages/tensorflow/include \
         -DCMAKE_BUILD_TYPE=Release
make ProGraphMSA dist
echo "built: $SRC/build/src/ProGraphMSA and $SRC/build/src/dist"
