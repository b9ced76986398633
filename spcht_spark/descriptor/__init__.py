"""Spcht Descriptor Format → DataFrame pipeline compiler.

The reference interprets the descriptor per record per node
(/root/reference/Spcht/Core/SpchtCore.py:498-600, row-at-a-time Python);
here the descriptor is compiled ONCE into a Catalyst Column-expression
tree — a select/explode pipeline over typed columns — and executed
entirely JVM-side (the only Python at runtime is the uuid5 Arrow UDF).
"""

from spcht_spark.descriptor.compiler import (  # noqa: F401
    compile_descriptor,
    load_descriptor,
)
