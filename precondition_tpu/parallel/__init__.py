"""Distribution substrate: meshes, sharding rules, distributed solves."""
