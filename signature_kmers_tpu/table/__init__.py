"""Signature-table layouts and layout-agnostic helpers.

Three interchangeable HBM layouts (all exact-membership, all probed via
ops/probe.table_probe): wide tagged-bucket (wide_table.py, the production
default), bucketed cuckoo (bucket_table.py), linear probing
(kmer_table.py, legacy/reference-shaped).  They replace the reference's
storage backends (nudb_kmer_db.h / cmph_kmer.h / kept_kmer_db.h), which
were likewise duck-type interchangeable on fetch().
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from .bucket_table import BucketKmerTable
from .kmer_table import KmerTable
from .wide_table import WideKmerTable, WideTableConfig, compact_config


@runtime_checkable
class KmerTableProtocol(Protocol):
    """The duck type every signature-table layout implements.

    The reference's three storage backends are likewise interchangeable
    on a duck-typed ``fetch`` (kept_kmer_db.h:20, nudb_kmer_db.h:113,
    cmph_kmer.h:139); here the contract is batched:

      n_items            stored key count
      lookup_np(qhi, qlo, with_aux=True) -> (found, v0, v1, v2) host probe
      device_arrays(with_aux) -> tuple of HBM arrays for the device probe
      save(base) / load(base) / exists(base)   persistence

    The device probe fn comes from ops.probe.table_probe: layouts either
    expose their own ``probe(with_aux)`` method (table/cmph_table.py) or
    are dispatched by type there.  Value words are KmerTable.pack_values
    order: v0 = avg | func<<16, v1 = mean | median<<16, v2 = var.

    ``occupied() -> (hi, lo, v0, v1, v2)`` is additionally implemented by
    all exact-membership layouts (a CMPH store cannot enumerate keys).
    """

    @property
    def n_items(self) -> int: ...

    def lookup_np(self, qhi, qlo, with_aux: bool = True) -> tuple: ...

    def device_arrays(self, with_aux: bool = False) -> tuple: ...

    def save(self, base) -> None: ...


def _wide_config(layout: str) -> WideTableConfig:
    return compact_config() if layout == "wide-compact" else WideTableConfig()


def build_table(hi, lo, v0, v1, v2, config=None):
    """Build the configured production layout from packed value words."""
    layout = getattr(config, "layout", "wide")
    if layout == "cuckoo":
        from ..core.config import TableConfig

        return BucketKmerTable.build(hi, lo, v0, v1, v2,
                                     config or TableConfig())
    return WideKmerTable.build(hi, lo, v0, v1, v2, _wide_config(layout))


def table_from_stats(hi, lo, avg_from_end, function_index, mean, median,
                     var, config=None):
    """Build the configured production layout from StoredKmerData fields."""
    v0, v1, v2 = KmerTable.pack_values(avg_from_end, function_index,
                                       mean, median, var)
    return build_table(hi, lo, v0, v1, v2, config)


def open_table(base):
    """Load whichever table layout exists at `base` (kmer_data.{npz,json})."""
    if WideKmerTable.exists(base):
        return WideKmerTable.load(base)
    if BucketKmerTable.exists(base):
        return BucketKmerTable.load(base)
    if KmerTable.exists(base):
        return KmerTable.load(base)
    raise FileNotFoundError(f"No kmer table at {base}")


def table_exists(base) -> bool:
    return (WideKmerTable.exists(base) or BucketKmerTable.exists(base)
            or KmerTable.exists(base))
