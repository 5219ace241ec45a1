"""Sources & sinks beyond the lakehouse: the CSV snapshot round-trip kept
for reference parity (Extraction/Insertion tasks of the reference)."""
