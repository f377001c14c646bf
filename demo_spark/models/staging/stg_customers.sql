-- staging: rename the raw seed's id to customer_id (projection + alias layer)
select
    id as customer_id,
    first_name,
    last_name
from {{ ref('raw_customers') }}
