"""Scalar column-expression libraries.

Everything here returns JVM-side Column expressions (whole-stage codegen
friendly) unless explicitly named ``*_udf`` — UDFs are the slow path and
only used where built-ins cannot express the semantics (pyproj CRS
transforms, lexicon sentiment).
"""
