select id as payment_id,
       account_id,
       amount_cents / 100.0 as amount,
       status
from {{ ref('raw_payments') }}
