{{ config(materialized='ephemeral') }}
-- per-order payment totals; ephemeral: inlined as a CTE into consumers,
-- never registered as a relation
select order_id, sum(amount) as total_amount, count(*) as n_payments
from {{ ref('stg_payments') }}
group by order_id
