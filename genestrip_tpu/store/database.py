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
CONFIG_INFO_FILE = "configInfo.properties"

DB_MD5 = "dbMD5"


class Database:
    def __init__(self, table: KmerTable, tree: SmallTaxTree, config_info: dict | None = None):
        self.table = table
        self.tree = tree
        self.config_info = dict(config_info or {})

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

    def save(self, path) -> None:
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

    @staticmethod
    def load(path) -> "Database":
        with zipfile.ZipFile(path, "r") as z:
            table = KmerTable.load_npz(io.BytesIO(z.read(TABLE_FILE)))
            tree = SmallTaxTree.from_json(z.read(TAXTREE_FILE).decode())
            config_info = _parse_props(z.read(CONFIG_INFO_FILE).decode())
        db = Database(table, tree, config_info)
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
