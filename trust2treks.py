#!/usr/bin/env python3
"""TRUST -> T-Reks format adapter.

Runs the TRUST tandem-repeat detector (nl.vu.cs.align.SelfSimilarity) on a
FASTA file and rewrites its output in the T-Reks block format that the
repeat pipeline consumes (``prographmsa_tpu.repeats_treks.parse_treks_output``
/ ``--read_repeats``), so TRUST can substitute for T-Reks via
``--custom_tr_cmd 'python3 trust2treks.py'``.

Behavioral port of /root/reference/trust2treks.py:32-105 (python2): sequence
names are aliased S1..Sn before handing them to TRUST (it mangles long
names), repeat units are grouped into *contiguous* runs (a unit whose start
is not the previous start+length opens a new block), and each run of >= 2
units becomes one T-Reks block::

    Length: <width> residues - nb: XXX  from  <start> to <end> - Psim:1.0 region Length:<len>

where width is the aligned-unit width, start/end are 1-based residue
coordinates, and region length excludes gap columns.  TRUST invocation
parameters (BLOSUM62, -gapo 8 -gapx 2, -noseg, -force) mirror the
reference's.  The conversion is a pure function (``convert_trust_output``)
so tests need no Java.
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile


TRUST_ARGS = ["-matrix", "BLOSUM62", "-noseg", "-gapo", "8", "-gapx", "2",
              "-force", "-procTotal", "1"]


def alias_fasta(lines):
    """Rewrite FASTA headers to S1..Sn; returns (aliased_text, namemap)."""
    out = []
    namemap = {}
    for line in lines:
        if line.startswith(">"):
            alias = "S%d" % (len(namemap) + 1)
            namemap[alias] = line[1:].strip()
            out.append(">%s\n" % alias)
        else:
            out.append(line if line.endswith("\n") else line + "\n")
    return "".join(out), namemap


def _emit_block(out, width, start, end, msa):
    """One T-Reks block for a contiguous run of >= 2 aligned units."""
    gaps = sum(unit.count("-") for unit in msa)
    region = end - start + 1 - gaps
    out.append("Length: %d residues - nb: XXX  from  %d to %d - Psim:1.0 "
               "region Length:%d\n" % (width, start, end, region))
    out.append("\n".join(msa))
    out.append("\n**********************\n\n")


def _next(lines):
    """next() with a diagnostic instead of a bare StopIteration on
    truncated/malformed TRUST output (ADVICE r4)."""
    line = next(lines, None)
    if line is None:
        raise ValueError("TRUST output truncated: unexpected end of input")
    return line


def convert_trust_output(text: str, namemap) -> str:
    """TRUST stdout -> T-Reks formatted text (pure; no subprocess)."""
    out = []
    lines = iter(text.split("\n"))
    for line in lines:
        if line.startswith(">"):
            alias = line[1:].strip()
            out.append(">%s\n" % namemap.get(alias, alias))
        elif line.startswith("# START LENGTH"):
            first = _next(lines).split()
            starts = [int(first[0])]
            lengths = [int(first[1])]
            for line in lines:
                if "# Repeat" not in line:
                    break
                parts = line.split()
                starts.append(int(parts[0]))
                lengths.append(int(parts[1]))
            # skip to the first aligned unit ('>' header then unit line)
            while not line.startswith(">"):
                line = _next(lines)
            unit = _next(lines).strip().upper()
            width = len(unit)
            msa = [unit]
            start = starts[0]
            for i in range(1, len(starts) + 1):
                contiguous = (i < len(starts)
                              and starts[i] == starts[i - 1] + lengths[i - 1])
                if not contiguous:
                    end = starts[i - 1] + lengths[i - 1] - 1
                    if len(msa) > 1:
                        _emit_block(out, width, start, end, msa)
                    if i == len(starts):
                        break
                    msa = []
                    width = None     # a new run may use a new unit width
                    start = starts[i]
                line = _next(lines)
                if not line.startswith(">"):
                    raise ValueError("TRUST output: expected unit header, "
                                     "got %r" % line)
                unit = _next(lines).strip().upper()
                if width is None:
                    width = len(unit)
                elif len(unit) != width:
                    raise ValueError("TRUST output: unit width mismatch")
                msa.append(unit)
    return "".join(out)


def main(argv):
    if len(argv) < 2:
        print("usage: trust2treks.py <fasta> [trust-classpath-dir]",
              file=sys.stderr)
        return 2
    infile = argv[1]
    cwd = argv[2] if len(argv) > 2 else os.environ.get("TRUST_DIR", "Align")
    with open(infile) as f:
        aliased, namemap = alias_fasta(f)
    with tempfile.NamedTemporaryFile("w", suffix=".fasta") as tmp:
        tmp.write(aliased)
        tmp.flush()
        cmd = ["java", "-Xmx200m", "-Xms200m", "-Xmn50m", "-cp", ".",
               "nl.vu.cs.align.SelfSimilarity", "-fasta", tmp.name,
               *TRUST_ARGS]
        proc = subprocess.run(cmd, cwd=cwd, stdout=subprocess.PIPE,
                              stderr=subprocess.DEVNULL, text=True)
        if proc.returncode != 0:
            print("trust2treks: TRUST exited %d" % proc.returncode,
                  file=sys.stderr)
            return 1
    sys.stdout.write(convert_trust_output(proc.stdout, namemap))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
