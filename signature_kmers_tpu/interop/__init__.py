"""Reference on-disk store interop (read AND write, pure numpy).

The reference's production artifacts are a CMPH BDZ minimal-perfect-hash
``.mph`` plus a flat StoredKmerData value array (ref: cmph_kmer.h:95-104,
perfect_hash.h:57-63) and a NuDB ``.dat/.key/.log`` triple
(ref: nudb_kmer_db.h:32-63).  This package reads both formats without
libcmph / NuDB, and writes them so reference binaries can consume this
framework's builds.
"""
