select id as account_id, holder, region
from {{ ref('raw_accounts') }}
