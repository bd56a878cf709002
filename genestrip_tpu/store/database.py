"""The database container: k-mer table + compact taxonomy + provenance.

Reference equivalent: core store/Database.java — a zip of the serialized
store, its bloom pre-filter and a configInfo.properties entry carrying an
MD5 fingerprint of the database payload (ref: Database.save:201-237). The
TPU format replaces Java serialization with npz (table) + JSON (taxonomy);
there is no bloom pre-filter entry (lookups are batched binary search, and
a Pallas bloom stage, if added, is derived data). The MD5 is computed over
the table + taxonomy payloads and stamped into configInfo under the same
"dbMD5" key so result CSVs carry the same provenance field.
"""

from __future__ import annotations

import hashlib
import io
import zipfile

import numpy as np

from genestrip_tpu.store.table import KmerTable
from genestrip_tpu.tax.small import SmallTaxTree

TABLE_FILE = "table.npz"
TAXTREE_FILE = "taxtree.json"
HASH_FILE = "hash.npz"
CONFIG_INFO_FILE = "configInfo.properties"

DB_MD5 = "dbMD5"


class Database:
    def __init__(self, table: KmerTable, tree: SmallTaxTree, config_info: dict | None = None):
        self.table = table
        self.tree = tree
        self.config_info = dict(config_info or {})
        # Optional persisted quotient-hash (derived data; see save()) — the
        # matcher uses it to skip the hash build at load time. The reference
        # likewise serializes its store's internal layout + pre-filter
        # directly (ref: store/Database.java:201-250 db.ser/bloom.ser).
        self.prebuilt_hash = None

    def init_store_indices(self) -> None:
        """ref: Database.initStoreIndices — pre-order value-index assignment."""
        self.tree.init_store_indices(self.table)

    def stats(self) -> dict:
        """Per-taxid stored k-mer counts; None key = total entries
        (ref: AbstractKMerStore.getNKmersPerTaxid:338-356)."""
        counts = self.table.n_kmers_per_value()
        out = {self.table.values[i]: int(counts[i]) for i in range(len(counts))}
        out[None] = self.table.entries
        return out

    @property
    def md5(self) -> str | None:
        return self.config_info.get(DB_MD5)

    @property
    def k(self) -> int:
        return self.table.k

    # -- persistence ---------------------------------------------------------

    def save(self, path, include_hash: bool = False) -> None:
        """Write the zip. With include_hash, the derived quotient-hash
        (store/hash.py) is persisted as an extra STORED entry so match runs
        skip the hash build at load time — used for the final db, not the
        tempdb (whose values the update phase still rewrites). The MD5 covers
        only table + taxonomy (the hash is derived data), so hash presence
        does not change database identity."""
        buf = io.BytesIO()
        self.table.save_npz(buf)
        table_bytes = buf.getvalue()
        tree_bytes = self.tree.to_json().encode()
        digest = hashlib.md5()
        digest.update(table_bytes)
        digest.update(tree_bytes)
        self.config_info[DB_MD5] = digest.hexdigest()
        with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as z:
            z.writestr(TABLE_FILE, table_bytes)
            z.writestr(TAXTREE_FILE, tree_bytes)
            z.writestr(CONFIG_INFO_FILE, _props_bytes(self.config_info))
            if include_hash:
                if self.prebuilt_hash is None:
                    from genestrip_tpu.store.hash import build_hash
                    self.prebuilt_hash = build_hash(self.table.keys,
                                                    self.table.value_idx)
                ht = self.prebuilt_hash
                hbuf = io.BytesIO()
                np.savez(hbuf, rows=ht.rows,
                         nb_bits=np.int64(ht.nb_bits),
                         slot_of_entry=ht.slot_of_entry.astype(np.int64),
                         # identity stamp: load ignores a hash whose table
                         # no longer matches (derived-data safety)
                         db_md5=np.array(self.config_info[DB_MD5]))
                # STORED: the packed rows are high-entropy; deflate would
                # cost tens of seconds for a few % size
                z.writestr(zipfile.ZipInfo(HASH_FILE), hbuf.getvalue(),
                           compress_type=zipfile.ZIP_STORED)

    @staticmethod
    def load(path) -> "Database":
        with zipfile.ZipFile(path, "r") as z:
            table = KmerTable.load_npz(io.BytesIO(z.read(TABLE_FILE)))
            tree = SmallTaxTree.from_json(z.read(TAXTREE_FILE).decode())
            config_info = _parse_props(z.read(CONFIG_INFO_FILE).decode())
            prebuilt = None
            if HASH_FILE in z.namelist():
                from genestrip_tpu.store.hash import (
                    KmerHashTable, vidx_of_slot_from_rows)
                with np.load(io.BytesIO(z.read(HASH_FILE))) as h:
                    stamp = str(h["db_md5"]) if "db_md5" in h else None
                    if stamp == config_info.get(DB_MD5):
                        rows = h["rows"]
                        nb_bits = int(h["nb_bits"])
                        soe = h["slot_of_entry"]
                        prebuilt = KmerHashTable(
                            rows, nb_bits, soe,
                            vidx_of_slot_from_rows(rows, nb_bits))
                    # else: stale derived data (table edited without a
                    # re-save) — fall back to building the hash at use
        db = Database(table, tree, config_info)
        db.prebuilt_hash = prebuilt
        db.init_store_indices()
        return db

    @staticmethod
    def load_config_info(path) -> dict:
        with zipfile.ZipFile(path, "r") as z:
            return _parse_props(z.read(CONFIG_INFO_FILE).decode())


def _props_bytes(props: dict) -> bytes:
    lines = ["# Genestrip-TPU database configuration information"]
    for k in sorted(props):
        lines.append(f"{k}={props[k]}")
    return ("\n".join(lines) + "\n").encode()


def _parse_props(text: str) -> dict:
    out = {}
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#") or "=" not in line:
            continue
        k, _, v = line.partition("=")
        out[k.strip()] = v.strip()
    return out
