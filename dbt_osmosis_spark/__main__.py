from dbt_osmosis_spark.cli import main

raise SystemExit(main())
