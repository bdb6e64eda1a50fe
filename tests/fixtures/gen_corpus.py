"""Deterministic synthetic training corpus generator.

Produces a small multi-genome protein corpus with clear per-function
conserved cores (so signature 8-mers exist), exercising both metadata
paths: assignment files (id \t function) and deflines with a trailing
"[genome]" tag.
"""

from __future__ import annotations

import random
from pathlib import Path

AA = "ACDEFGHIKLMNPQRSTVWY"

FUNCTIONS = [
    "Phenylalanyl-tRNA synthetase alpha chain (EC 6.1.1.20)",
    "DNA gyrase subunit B (EC 5.99.1.3)",
    "Translation elongation factor Tu",
    "Chaperone protein DnaK",
    "Preprotein translocase secY subunit",
    "Ribosomal protein S12p",
    "hypothetical protein",
]


def _rand_prot(rng: random.Random, n: int) -> str:
    return "".join(rng.choice(AA) for _ in range(n))


def _family_variant(rng: random.Random, core: str, n_mut: int) -> str:
    s = list(core)
    for _ in range(n_mut):
        i = rng.randrange(len(s))
        s[i] = rng.choice(AA)
    return "".join(s)


def generate_corpus(root: Path, n_genomes: int = 6, seed: int = 20240817):
    root = Path(root)
    fasta_dir = root / "Seqs"
    defs_dir = root / "Annotations"
    query_dir = root / "Queries"
    fasta_dir.mkdir(parents=True, exist_ok=True)
    defs_dir.mkdir(parents=True, exist_ok=True)
    query_dir.mkdir(parents=True, exist_ok=True)

    rng = random.Random(seed)
    # Conserved cores per function family (long enough for many 8-mers).
    cores = {fn: _rand_prot(rng, 220) for fn in FUNCTIONS}

    for g in range(n_genomes):
        genome_id = f"100{g}.7"
        use_defline = g % 2 == 0  # even genomes carry functions on deflines
        fasta_lines = []
        def_lines = []
        peg = 1
        for fn in FUNCTIONS:
            # two copies per function per genome, lightly mutated
            for _rep in range(2):
                seq = (_rand_prot(rng, 15)
                       + _family_variant(rng, cores[fn], 6)
                       + _rand_prot(rng, 15))
                fid = f"fig|{genome_id}.peg.{peg}"
                peg += 1
                if use_defline:
                    fasta_lines.append(f">{fid} {fn} [{genome_id}]")
                else:
                    fasta_lines.append(f">{fid}")
                    def_lines.append(f"{fid}\t{fn}")
                for i in range(0, len(seq), 60):
                    fasta_lines.append(seq[i:i + 60])
        (fasta_dir / genome_id).write_text("\n".join(fasta_lines) + "\n")
        if def_lines:
            (defs_dir / genome_id).write_text("\n".join(def_lines) + "\n")

    # Query set: fresh variants of the cores plus pure-random decoys.
    q_lines = []
    for qi, fn in enumerate(FUNCTIONS):
        seq = (_rand_prot(rng, 10) + _family_variant(rng, cores[fn], 8)
               + _rand_prot(rng, 10))
        q_lines.append(f">query.{qi} unknown")
        for i in range(0, len(seq), 60):
            q_lines.append(seq[i:i + 60])
    for d in range(3):
        seq = _rand_prot(rng, 180)
        q_lines.append(f">decoy.{d}")
        for i in range(0, len(seq), 60):
            q_lines.append(seq[i:i + 60])
    (query_dir / "queries.fa").write_text("\n".join(q_lines) + "\n")
    return root
