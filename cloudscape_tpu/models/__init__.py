"""Pipeline stages: atmosphere LUTs, cloud density/march, compositor."""
