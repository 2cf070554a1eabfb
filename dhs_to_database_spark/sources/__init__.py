"""Data sources: driver test tables, fixed-width CSPro demux, DCF dictionaries."""
