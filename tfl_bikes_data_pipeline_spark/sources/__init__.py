"""Raw-format ingest parity (CSV-with-schema, XML, XLSX, netCDF-shaped)."""
