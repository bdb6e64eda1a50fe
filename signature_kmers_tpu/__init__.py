"""signature_kmers_tpu — a TPU-native signature-k-mer framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
olsonanl/signature_kmers C++ toolkit: build signature amino-acid 8-mer sets
from annotated protein FASTA corpora, call protein function by streaming
query k-mers through an HBM-resident hash table, and compute all-vs-all
shared-signature-k-mer distance matrices — single chip to multi-host pod
slices.

Layering:

- core/     alphabet + packed k-mer codec, configs, SEED grammar, FunctionMap
- io/       FASTA + artifact formats (array-shaped batches)
- ops/      device kernels: k-mer packing, hashing, hash probe, segment stats
- table/    HBM static open-addressing signature table (build/save/load)
- models/   the pipelines: SignatureBuilder, FunctionCaller, MatrixDistance
- golden/   pure-Python executable spec used as the test oracle
- parallel/ mesh + sharding policies (DP query sharding, TP table sharding)
- runtime/  native C++ host I/O (FASTA scanner) + bindings
- service/  batched annotation service
- stats/    Jenks-Fisher natural breaks
- cli/      command-line drivers matching the reference binaries
"""

__version__ = "0.1.0"
