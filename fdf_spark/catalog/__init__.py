"""Declarative signal catalog + lazy Machine/Shot/Container/Signal API.

The reference drives everything from per-diagnostic XML schema files
compiled into Python classes (factory.py:654-686, 919-1059). Here the
same schema surface is a declarative Python registry compiled once
(memoized, mirroring ``_tree_dict`` factory.py:651) into catalog
entries, each binding a logical signal to a long-format Parquet table
plus column expressions for its transforms.
"""

from fdf_spark.catalog.api import Machine
from fdf_spark.catalog.registry import Catalog, get_catalog

__all__ = ["Machine", "Catalog", "get_catalog"]
