"""Model DAGs: pure DataFrame → DataFrame functions, composed topologically."""
