"""Graph analytics over nodes/edges DataFrames (Lab 3 surface).

The engine's canonical graph format is a pair of DataFrames:
``nodes(id, x, y, ...)`` and ``edges(src, dst, weight, ...)`` —
the table-native re-expression of the reference's OSMnx/networkx
MultiDiGraph (lab3a nb cell 4-5).
"""
