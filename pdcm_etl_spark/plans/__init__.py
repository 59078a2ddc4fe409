"""Plans: declarative query catalog, DAG runner, SQL view layer."""
