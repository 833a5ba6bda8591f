"""zelph-spark: a from-scratch PySpark-native knowledge-graph construction
and in-network reasoning engine with the capabilities of acrion/zelph.

Not a port: zelph is a single-process, pointer-chasing C++ semantic network
(reference at /root/reference); this engine re-expresses the same WHAT —
triple extraction, entity linking, canonicalization, graph materialization,
and fixpoint rule inference — as partitioned, columnar Spark DataFrame plans
(see SURVEY.md for the operator-by-operator mapping with file:line cites).
"""

__version__ = "0.1.0"
