"""Applications: built-in test scenes and the SimpleViewer-style CLI."""
