"""xlink_ray — a Ray-Data-native entity-resolution / web-text data-processing engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the XLink entity-linking system (reference:
solitaryzero/XLink), re-expressed Ray-Data-first:

* every logical table is a ``ray.data.Dataset`` of Arrow blocks,
* per-record transforms are vectorized ``map_batches`` stages,
* stateful stages (dictionaries, automatons, embedding matrices) are
  actor pools with state loaded once per actor in ``__init__``,
* wide steps (grouped counts, probability tables, blocking, transitive
  clustering) are explicit ``groupby`` / aggregate shuffles with
  documented partition keys and skew handling.

Nothing here imports from the reference; file:line citations in
docstrings point at the behavior being matched, not code being reused.
"""

__version__ = "0.1.0"
